"""Multimodal columns (SURVEY.md §2.11 X5): image/audio/video as opaque
``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The decode step is REAL for lib-free formats — binary PPM and
uncompressed 24-bit BMP parse with numpy, WAV PCM via the stdlib
``wave`` module (see ``decode_image``) — and STUBBED only for
compressed codecs (png/jpeg/video need PIL/libvips/ffmpeg, absent from
this container). The Spark-side plumbing — schema, batching, partition
sizing, UDF signatures — is identical on both paths and also tested
with deterministic fake decoders.

Scale notes: binary payloads dominate partition size; size partitions by
``spark.sql.files.maxPartitionBytes`` and repartition by a content-hash so a
handful of 4K videos doesn't skew one task. Metadata-only operations (group
by format, length histograms) never touch ``content`` thanks to Parquet
column pruning — keep metadata and payload in the same table but distinct
columns.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, path string, format string, n_bytes long, content binary"
)

FEATURE_SCHEMA = "media_id long, format string, n_bytes long, width int, height int, feature array<float>"


def attach_metadata(binary_df: DataFrame) -> DataFrame:
    """Wrap a binaryFile scan (path, modificationTime, length, content) into
    the engine's media schema; format sniffed from magic bytes, JVM-side."""
    head = F.hex(F.substring(F.col("content"), 1, 4))
    fmt = (
        F.when(head.startswith("89504E47"), "png")
        .when(head.startswith("FFD8"), "jpeg")
        .when(head.startswith("52494646"), "riff")  # wav/avi containers
        .when(head.startswith("664C6143"), "flac")
        .when(head.startswith("5036"), "ppm")  # 'P6' binary portable pixmap
        .when(head.startswith("424D"), "bmp")  # 'BM'
        .otherwise("unknown")
    )
    return binary_df.select(
        F.xxhash64("path").alias("media_id"),
        F.col("path"),
        fmt.alias("format"),
        F.col("length").alias("n_bytes"),
        F.col("content"),
    )


def decode_image(content: bytes, dim: int = 8) -> tuple[int, int, list[float]]:
    """Decode an image payload to (width, height, feature_vector).

    REAL for the lib-free formats — binary PPM (P6) and uncompressed
    24-bit BMP are parsed with numpy alone; PNG (8-bit RGB/RGBA/gray,
    any scanline filter) decodes via stdlib zlib + a numpy unfilter
    (_decode_png); WAV PCM (RIFF/WAVE) decodes via the stdlib ``wave``
    module, mapping (n_channels, sample_rate//1000) into the (width,
    height) slots so audio rides the same feature schema.
    ENTROPY-CODED formats (jpeg/video/gif) still raise: their codecs
    (PIL/libvips/ffmpeg) are not in this container — callers fall
    back to ``extract_features(fake=True)`` for those, and the
    per-payload try/except in extract_features turns a mixed-format
    corpus into real features where possible, NULLs elsewhere.

    The feature vector is ``dim`` floats in [0, 1]: overall mean, per-
    channel/segment means, and coarse spatial (or temporal) pooling —
    deterministic functions of the exact decoded samples.
    """
    head = bytes(content[:4])
    if head[:2] == b"P6":
        return _decode_ppm(content, dim)
    if head[:2] == b"BM":
        return _decode_bmp(content, dim)
    if bytes(content[:8]) == b"\x89PNG\r\n\x1a\n":
        w, h, arr = _decode_png_pixels(content)
        return w, h, _pool_feature(arr.astype("float64") / 255.0, dim)
    if head == b"RIFF" and bytes(content[8:12]) == b"WAVE":
        return _decode_wav(content, dim)
    raise NotImplementedError(
        "entropy-coded image/video decode (jpeg/gif/video) requires "
        "PIL/libvips/ffmpeg — not available in this environment; "
        "PPM/BMP/PNG/WAV decode natively, other formats use "
        "extract_features(df, fake=True)"
    )


def _decode_png_pixels(content: bytes):
    """Lib-free PNG decode (stdlib zlib + numpy): 8-bit-depth grayscale
    (color type 0), RGB (2) and RGBA (6), no interlace — chunk walk,
    IDAT inflate, per-scanline unfilter (None/Sub/Up/Average/Paeth, the
    full filter set), alpha dropped so every image lands in the shared
    (h, w, channels) pixel contract. Interlaced, paletted and sub-byte
    depths raise: they are rare in training crawls and add no new
    mechanism. Entropy-coded formats (jpeg) genuinely need external
    codecs; DEFLATE does not — it ships in the standard library."""
    import struct
    import zlib

    import numpy as np

    buf = bytes(content)
    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, width, height, ch = 8, None, None, None
    idat = b""
    while pos + 8 <= len(buf):
        length, ctype = struct.unpack_from(">I4s", buf, pos)
        data = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8:
                raise NotImplementedError("only 8-bit-depth PNG decodes natively")
            if color not in (0, 2, 6):
                raise NotImplementedError(
                    "only grayscale/RGB/RGBA PNG decodes natively"
                )
            if interlace:
                raise NotImplementedError("interlaced PNG not supported")
            ch = {0: 1, 2: 3, 6: 4}[color]
        elif ctype == b"IDAT":
            # spec: IHDR is the first chunk; a payload carrying pixel
            # data before the header is malformed — reject explicitly
            # rather than decode with a later header's geometry (and so
            # direct callers get ValueError, never a NameError on ch)
            if width is None:
                raise ValueError("PNG IDAT before IHDR")
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(idat)
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline payload has wrong length")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters, data = rows[:, 0], rows[:, 1:].astype(np.int64)
    out = np.zeros_like(data)
    for y in range(height):
        f, cur = int(filters[y]), data[y].copy()
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if f == 0:  # None
            out[y] = cur
        elif f == 2:  # Up
            out[y] = (cur + prev) & 0xFF
        else:  # Sub/Average/Paeth need the in-row left neighbor: scan x
            row = out[y]
            for x in range(stride):
                a = row[x - ch] if x >= ch else 0
                b = prev[x]
                if f == 1:  # Sub
                    v = cur[x] + a
                elif f == 3:  # Average
                    v = cur[x] + (a + b) // 2
                elif f == 4:  # Paeth
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = cur[x] + pred
                else:
                    raise ValueError(f"unknown PNG filter {f}")
                row[x] = v & 0xFF
    px = out.reshape(height, width, ch)
    if ch == 4:
        px = px[:, :, :3]  # drop alpha: shared RGB pixel contract
    return width, height, px


def _pool_feature(arr, dim: int) -> list[float]:
    """dim floats in [0, 1] from a (pixels, channels) or (samples,) float
    array scaled to [0, 1]: global mean, then means of dim-1 contiguous
    segments — deterministic coarse pooling."""
    import numpy as np

    flat = arr.reshape(-1)
    segs = np.array_split(flat, max(dim - 1, 1))
    out = [float(flat.mean())] + [float(s.mean()) if s.size else 0.0 for s in segs]
    return [min(max(v, 0.0), 1.0) for v in out[:dim]] + [0.0] * max(
        0, dim - len(out)
    )


def _decode_ppm(content: bytes, dim: int) -> tuple[int, int, list[float]]:
    """Binary PPM (P6): ASCII header 'P6 <w> <h> <maxval>' (with
    #-comments) followed by w*h*3 raw bytes."""
    import numpy as np

    buf = bytes(content)
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":  # comment runs to end of line
            pos = buf.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    px = np.frombuffer(buf, dtype=np.uint8, count=width * height * 3, offset=pos)
    arr = px.astype(np.float64).reshape(height, width, 3) / float(maxval)
    return width, height, _pool_feature(arr, dim)


def _decode_bmp(content: bytes, dim: int) -> tuple[int, int, list[float]]:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER): rows bottom-up, padded
    to 4-byte boundaries, BGR order."""
    import struct

    import numpy as np

    buf = bytes(content)
    data_off = struct.unpack_from("<I", buf, 10)[0]
    width, height = struct.unpack_from("<ii", buf, 18)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    compression = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP decodes natively")
    flip = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=stride * height, offset=data_off
    ).reshape(height, stride)[:, : width * 3]
    arr = rows.reshape(height, width, 3)[:, :, ::-1]  # BGR -> RGB
    if flip:
        arr = arr[::-1]
    return width, height, _pool_feature(arr.astype(np.float64) / 255.0, dim)


def _decode_wav(content: bytes, dim: int) -> tuple[int, int, list[float]]:
    """WAV PCM via the stdlib wave module: (n_channels, sample_rate//1000)
    ride the (width, height) slots; the feature pools |sample| energy."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(bytes(content))) as w:
        n_ch, sampwidth, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        frames = w.readframes(w.getnframes())
    if sampwidth != 2:
        raise NotImplementedError("only 16-bit PCM WAV decodes natively")
    samples = np.frombuffer(frames, dtype="<i2").astype(np.float64)
    return n_ch, rate // 1000, _pool_feature(np.abs(samples) / 32768.0, dim)


def _raw_samples(content: bytes):
    """Integer sample array for perceptual hashing: the EXACT decoded
    bytes (PPM/BMP pixels as uint8 RGB, WAV as |int16| samples) with the
    parsed (width, height) — no pooling, no floats, so everything
    derived from it is integer arithmetic an oracle can replay."""
    import struct

    import numpy as np

    buf = bytes(content)
    head = buf[:4]
    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        w, h, px = _decode_png_pixels(buf)
        return w, h, px.reshape(-1).astype(np.int64)
    if head[:2] == b"P6":
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(buf) and buf[pos : pos + 1].isspace():
                pos += 1
            if buf[pos : pos + 1] == b"#":
                pos = buf.index(b"\n", pos) + 1
                continue
            start = pos
            while pos < len(buf) and not buf[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(buf[start:pos]))
        pos += 1
        width, height, _ = fields
        px = np.frombuffer(buf, dtype=np.uint8, count=width * height * 3, offset=pos)
        return width, height, px.astype(np.int64)
    if head[:2] == b"BM":
        data_off = struct.unpack_from("<I", buf, 10)[0]
        width, height = struct.unpack_from("<ii", buf, 18)
        bpp = struct.unpack_from("<H", buf, 28)[0]
        compression = struct.unpack_from("<I", buf, 30)[0]
        if bpp != 24 or compression != 0:
            raise NotImplementedError("only uncompressed 24-bit BMP decodes natively")
        flip = height > 0
        height = abs(height)
        stride = (width * 3 + 3) & ~3
        rows = np.frombuffer(
            buf, dtype=np.uint8, count=stride * height, offset=data_off
        ).reshape(height, stride)[:, : width * 3]
        arr = rows.reshape(height, width, 3)[:, :, ::-1]
        if flip:
            arr = arr[::-1]
        return width, height, arr.reshape(-1).astype(np.int64)
    if head == b"RIFF" and bytes(buf[8:12]) == b"WAVE":
        import io
        import wave

        with wave.open(io.BytesIO(buf)) as w:
            n_ch, sampwidth, rate = (
                w.getnchannels(),
                w.getsampwidth(),
                w.getframerate(),
            )
            frames = w.readframes(w.getnframes())
        if sampwidth != 2:
            raise NotImplementedError("only 16-bit PCM WAV decodes natively")
        samples = np.abs(np.frombuffer(frames, dtype="<i2").astype(np.int64))
        return n_ch, rate // 1000, samples
    raise NotImplementedError(
        "compressed-image/video decode requires PIL/libvips/ffmpeg — not "
        "available in this environment"
    )


def image_ahash(media: DataFrame, bits: int = 16, fake: bool = False) -> DataFrame:
    """Average-hash perceptual fingerprint — the image near-dup primitive
    (the LAION-style pHash-family shape): split the decoded integer
    samples into ``bits`` contiguous blocks (numpy array_split
    boundaries: the first ``n % bits`` blocks are one longer) and set
    bit i iff the block's mean exceeds the global mean. The comparison
    is INTEGER cross-multiplication — ``block_sum * n_total >
    total_sum * block_n`` — so the whole fingerprint is exact integer
    arithmetic on exact decoded bytes: bit-replayable by a SQL oracle,
    partitioning-independent, no float thresholds to drift. An exact
    pixel copy hashes identically (hamming 0) whatever its id or batch.

    Arrow mapInPandas over (media_id, format, n_bytes, content) — the
    decode never leaves the executor; emits
    (media_id, width, height, n_samples, ahash). ``bits`` <= 62 keeps
    the hash in a signed bigint. Empty blocks (fewer samples than bits)
    contribute 0-bits on both engines. ``fake=True`` swaps the
    crc32-seeded stand-in decode (env-gated codec corpora)."""
    import numpy as np
    import pandas as pd

    if not 1 <= bits <= 62:
        raise ValueError("bits must be in [1, 62] for a signed-bigint hash")

    def _hash_one(content) -> tuple:
        if fake:
            w, h, feat = _fake_decode(content, bits)
            arr = np.array([int(f * 255.0) for f in feat], dtype=np.int64)
        else:
            w, h, arr = _raw_samples(content)
        n = int(arr.size)
        total = int(arr.sum())
        out = 0
        for i, blk in enumerate(np.array_split(arr, bits)):
            bn = int(blk.size)
            if bn and int(blk.sum()) * n > total * bn:
                out |= 1 << i
        return w, h, n, out

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "width": [],
                "height": [],
                "n_samples": [],
                "ahash": [],
            }
            for content in pdf["content"]:
                try:
                    w, h, n, a = _hash_one(content)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_samples"].append(n)
                    out["ahash"].append(a)
                except Exception:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["n_samples"].append(None)
                    out["ahash"].append(None)
            yield pd.DataFrame(out)

    return media.select("media_id", "format", "n_bytes", "content").mapInPandas(
        _extract,
        schema=(
            "media_id bigint, width int, height int, "
            "n_samples bigint, ahash bigint"
        ),
    )


def png_encode(px_rows, filters, channels: int = 3) -> bytes:
    """Minimal stdlib PNG encoder (8-bit gray/RGB/RGBA, one filter type
    per scanline): raw pixel rows -> valid PNG bytes. Exists for
    synthetic fixtures and round-trip gates — the decode query encodes
    md5-derived pixels with every filter type and the production decoder
    must recover the exact byte sum."""
    import struct
    import zlib

    h = len(px_rows)
    stride = len(px_rows[0])
    w = stride // channels

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = b""
    prev = [0] * stride
    for y, row in enumerate(px_rows):
        f = filters[y]
        line = []
        for x in range(stride):
            a = row[x - channels] if x >= channels else 0
            b = prev[x]
            c = prev[x - channels] if x >= channels else 0
            pred = (0, a, b, (a + b) // 2, paeth(a, b, c))[f]
            line.append((row[x] - pred) & 0xFF)
        raw += bytes([f]) + bytes(line)
        prev = row
    color = {1: 0, 3: 2, 4: 6}[channels]

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _fake_decode(content: bytes, dim: int = 8) -> tuple[int, int, list[float]]:
    """Deterministic stand-in: 'dimensions' and 'features' derived from
    content bytes — stable across runs/partitionings (crc32, not Python
    hash(), which is salted per process)."""
    import zlib

    h = zlib.crc32(bytes(content[:64])) & 0x7FFFFFFF
    width, height = 16 + h % 1024, 16 + (h >> 10) % 1024
    feat = [((h >> (i % 24)) & 0xFF) / 255.0 for i in range(dim)]
    return width, height, feat


def extract_features(media: DataFrame, fake: bool = False, dim: int = 8) -> DataFrame:
    """Decode + featurize media rows via Arrow-batched mapInPandas.

    The UDF processes whole Arrow batches (not rows); decode failures yield
    null features rather than failing the task, which is the only sane
    behavior on a 100 TB crawl with corrupt members.
    """
    import pandas as pd

    decoder = _fake_decode if fake else decode_image

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "format": pdf["format"],
                "n_bytes": pdf["n_bytes"],
                "width": [],
                "height": [],
                "feature": [],
            }
            for content in pdf["content"]:
                try:
                    w, h, feat = decoder(content, dim)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["feature"].append(feat)
                except Exception:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["feature"].append(None)
            yield pd.DataFrame(out)

    return media.select("media_id", "format", "n_bytes", "content").mapInPandas(
        _extract, schema=FEATURE_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 10, fake: bool = True) -> DataFrame:
    """Frame-sampling plumbing for video payloads: fan each media row out to
    frame rows (media_id, frame_idx, frame binary). Real extraction needs
    ffmpeg (stubbed); the fake emits byte-slices so downstream shape is real."""
    import pandas as pd

    if not fake:
        raise NotImplementedError("video frame extraction requires ffmpeg — not in this environment")

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                n = max(1, len(content) // (every_n * 64))
                for i in range(min(n, 8)):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame"].append(bytes(content[i * 64 : (i + 1) * 64]))
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(
        _frames, schema="media_id long, frame_idx int, frame binary"
    )
