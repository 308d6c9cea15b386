"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — binary columns, typed metadata
structs, Arrow-batched ``mapInPandas`` decode operators with stable
schemas and partition-preserving shape. The actual media decoding is
STUBBED (this container ships no image/audio libraries): the default
``decoder`` is a deterministic fake that derives pseudo-dimensions from
the content hash; swapping in a real decoder (PIL/librosa/ffmpeg) is a
one-argument change, and everything around it — schema, batching,
partitioning — is already exercised by tests.

Scale notes: media blobs never shuffle — decode/feature-extract runs
map-side in the same stage as the scan; only compact features leave the
node. Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` which callers should
lower for large blobs (e.g. 64) so Arrow batches stay under a few
hundred MB.
"""

from __future__ import annotations

import hashlib
import struct
import wave
import zlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "id long, modality string, n_bytes long, sha1 string, "
    "width int, height int, n_channels int"
)


def fake_decode(content: bytes, modality: str) -> tuple[int, int, int]:
    """Deterministic stand-in for a real media decoder: pseudo
    width/height/channels derived from the content digest. Replace with
    PIL.Image.open / soundfile / av for real media."""
    h = hashlib.sha1(content).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, 1 + h[2] % 4


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (IHDR byte 9): gray, -, RGB, palette,
# gray+alpha, -, RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _decode_png_stdlib(content: bytes) -> tuple[int, int, int]:
    """Full pure-stdlib PNG decode (zlib inflate + per-scanline
    unfilter): returns (width, height, channels) only after the pixel
    bytes have actually been reconstructed, so a truncated or corrupt
    IDAT raises instead of yielding header-only metadata. Supports
    8-bit non-interlaced images — the common training-corpus case; the
    PIL branch handles everything else when installed."""
    import struct
    import zlib

    if content[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG (bad magic)")
    pos, idat = 8, []
    width = height = bit_depth = color_type = interlace = None
    while pos + 8 <= len(content):
        length = struct.unpack(">I", content[pos : pos + 4])[0]
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"stdlib PNG decoder handles 8-bit non-interlaced only "
            f"(got depth={bit_depth} color={color_type} "
            f"interlace={interlace}); install pillow for the rest"
        )
    ch = _PNG_CHANNELS[color_type]
    if width * height > _MAX_PIXELS:
        raise ValueError(
            f"PNG decompression bomb: {width}x{height} exceeds "
            f"{_MAX_PIXELS} pixels (PIL's 2x MAX_IMAGE_PIXELS envelope)"
        )
    stride = width * ch
    expected = height * (stride + 1)
    # Bound the inflate by the DECLARED size, not just the declared
    # dimensions: a 1x1 header over an IDAT that inflates to gigabytes
    # would otherwise materialize the whole output before the length
    # check could reject it. decompressobj(max_length=expected+1)
    # consumes input only until the output cap, so a small-dims/
    # huge-IDAT bomb allocates at most expected+1 bytes.
    d = zlib.decompressobj()
    raw = d.decompress(b"".join(idat), expected + 1)
    if len(raw) > expected:
        raise ValueError(
            "PNG decompression bomb: pixel data exceeds declared "
            f"{width}x{height}x{ch} dimensions"
        )
    raw += d.flush()
    # d.eof: the plain zlib.decompress call this replaced raised on an
    # incomplete stream (deflate payload present, adler32 trailer cut
    # off); the capped decompressobj form returns the payload without
    # complaint, so completeness must be asserted explicitly or a
    # truncated file reports as a successful real decode
    if len(raw) != expected or not d.eof:
        raise ValueError("PNG pixel data truncated")
    # Unfilter (types 0-4 per the PNG spec) to prove the pixels decode.
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        for x in range(stride):
            a = line[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ftype == 1:
                line[x] = (line[x] + a) & 0xFF
            elif ftype == 2:
                line[x] = (line[x] + b) & 0xFF
            elif ftype == 3:
                line[x] = (line[x] + (a + b) // 2) & 0xFF
            elif ftype == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
            elif ftype != 0:
                raise ValueError(f"bad PNG filter type {ftype}")
        prev = line
    return width, height, ch


def _decode_wav_stdlib(content: bytes) -> tuple[int, int, int]:
    """Audio decode via the stdlib ``wave`` module: reads ALL frames (so
    truncation raises), returns (n_frames, 1, n_channels) — the same
    shape convention as the soundfile branch."""
    import io
    import wave

    with wave.open(io.BytesIO(content), "rb") as w:
        n_frames, n_channels = w.getnframes(), w.getnchannels()
        data = w.readframes(n_frames)
        if len(data) != n_frames * n_channels * w.getsampwidth():
            raise ValueError("WAV frame data truncated")
    return n_frames, 1, n_channels


def library_decode(content: bytes, modality: str) -> tuple[int, int, int]:
    """Real media decode: images via PIL when installed, else a full
    pure-stdlib PNG decoder (inflate + unfilter — real pixel
    reconstruction, not header sniffing); audio via soundfile when
    installed, else the stdlib ``wave`` module for WAV. Raises a clear
    error naming the missing library for formats the stdlib fallbacks
    don't cover — so the real-decode branch is exercised in THIS
    container (PNG/WAV fixtures in tests/test_ext.py), while PIL/
    soundfile widen format coverage wherever they're installed."""
    if modality == "image":
        try:
            from PIL import Image  # type: ignore
        except ImportError:
            if content[:8] == _PNG_MAGIC:
                return _decode_png_stdlib(content)
            raise NotImplementedError(
                "non-PNG image decode needs pillow (PIL); not installed "
                "here — use fake_decode or pip install pillow"
            ) from None
        import io

        with Image.open(io.BytesIO(content)) as im:
            return im.width, im.height, len(im.getbands())
    if modality == "audio":
        try:
            import soundfile  # type: ignore
        except ImportError:
            if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
                return _decode_wav_stdlib(content)
            raise NotImplementedError(
                "non-WAV audio decode needs soundfile; not installed "
                "here — use fake_decode or pip install soundfile"
            ) from None
        import io

        data, _rate = soundfile.read(io.BytesIO(content))
        n_channels = 1 if data.ndim == 1 else data.shape[1]
        return int(data.shape[0]), 1, int(n_channels)
    raise NotImplementedError(f"no decoder wired for modality {modality!r}")


# The exception types a DECODE failure can legitimately raise (ADVICE
# r7: catch these, not bare Exception, so genuine bugs — TypeError,
# MemoryError, AttributeError — propagate instead of silently yielding
# fake dims): struct.error (truncated PNG header), zlib.error (bad
# IDAT), wave.Error + EOFError (bad WAV), ValueError (dimension/frame
# checks), NotImplementedError (no decoder for the format here),
# OSError (PIL's UnidentifiedImageError subclasses it), RuntimeError
# (soundfile's LibsndfileError subclasses it).
DECODE_FALLBACK_ERRORS: tuple[type[BaseException], ...] = (
    ValueError,
    struct.error,
    zlib.error,
    wave.Error,
    EOFError,
    NotImplementedError,
    OSError,
    RuntimeError,
)

# PIL's decompression-bomb guard raises a bare-Exception subclass (NOT
# OSError — ADVICE r8): with pillow installed, one hostile/oversized
# image would otherwise escape the fallback set and kill the whole
# decode job, violating hybrid_decode's one-corrupt-blob contract.
try:  # pragma: no cover — pillow not installed in this container
    from PIL.Image import DecompressionBombError as _PILBombError

    DECODE_FALLBACK_ERRORS = DECODE_FALLBACK_ERRORS + (_PILBombError,)
except ImportError:
    pass

# The stdlib PNG path enforces the same contract without PIL: PIL's
# default MAX_IMAGE_PIXELS is ~89.5M and it errors at 2x that, so the
# pure-stdlib decoder refuses the identical envelope BEFORE inflating
# pixel data (a hostile IHDR claiming 10^10 pixels otherwise walks
# into an attacker-sized decompress + per-pixel unfilter loop).
_MAX_PIXELS = 2 * 89_478_485


def hybrid_decode(content: bytes, modality: str) -> tuple[int, int, int]:
    """Real decode when the content is decodable (PIL/soundfile when
    installed, the stdlib PNG/WAV decoders otherwise), deterministic
    ``fake_decode`` for everything else — including CORRUPT media: a
    truncated PNG raises struct.error, a bad IDAT zlib.error, a garbage
    RIFF chunk RuntimeError, soundfile its own LibsndfileError — one
    corrupt blob must degrade to fake dims, not kill the job. Only the
    known decode-error types (``DECODE_FALLBACK_ERRORS``) degrade;
    anything else (TypeError, MemoryError, …) is a bug and propagates.
    For a measurable fallback rate use ``hybrid_decode_flagged`` /
    ``decode_features_observed``.

    Determinism caveat: output is deterministic GIVEN the environment's
    decoder set, but a format only PIL handles (e.g. JPEG) yields real
    dims where PIL is installed and fake dims where it is not — on a
    cluster with heterogeneous executor images, pin an explicit decoder
    (``library_decode`` or ``fake_decode``) instead of this hook."""
    try:
        return library_decode(content, modality)
    except DECODE_FALLBACK_ERRORS:
        return fake_decode(content, modality)


def hybrid_decode_flagged(
    content: bytes, modality: str
) -> tuple[int, int, int, bool]:
    """``hybrid_decode`` with the fallback made observable: returns
    (width, height, n_channels, fell_back). Callers aggregate the flag
    into a fake-dimension rate — at 100 TB a silent 30% fallback is a
    corrupted-corpus signal, not a convenience (ADVICE r7)."""
    try:
        w, h, c = library_decode(content, modality)
        return w, h, c, False
    except DECODE_FALLBACK_ERRORS:
        w, h, c = fake_decode(content, modality)
        return w, h, c, True


def best_decoder() -> Callable[[bytes, str], tuple[int, int, int]]:
    """The dispatching hook pipelines use: ``hybrid_decode`` — real
    decode wherever a decoder exists (including the stdlib PNG/WAV
    fallbacks, so the real branch is reachable WITHOUT PIL), fake
    dimensions only for genuinely undecodable content."""
    return hybrid_decode


# Backwards-compatible name: the honest stub is now the dispatching hook.
real_decode = library_decode


def attach_binary(df: DataFrame, text_col: str, modality: str = "image") -> DataFrame:
    """Build an opaque binary content column + metadata (the ingest shape
    for media: (id, content binary, modality, n_bytes))."""
    return df.select(
        F.col("doc_id").alias("id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit(modality).alias("modality"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
    )


def decode_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], tuple[int, int, int]] = fake_decode,
) -> DataFrame:
    """Arrow-batched decode/feature-extract over (id, content, modality):
    returns (id, modality, n_bytes, sha1, width, height, n_channels).
    Runs map-side via mapInPandas — blobs never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "id": pdf["id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(c) for c in pdf["content"]],
                    "sha1": [hashlib.sha1(c).hexdigest() for c in pdf["content"]],
                }
            )
            dims = [
                decoder(c, m) for c, m in zip(pdf["content"], pdf["modality"])
            ]
            out["width"] = [d[0] for d in dims]
            out["height"] = [d[1] for d in dims]
            out["n_channels"] = [d[2] for d in dims]
            yield out

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


OBSERVED_SCHEMA = (
    "id long, modality string, n_bytes long, sha1 string, "
    "width int, height int, n_channels int, decode_fallback boolean"
)


def decode_features_observed(media: DataFrame) -> DataFrame:
    """``decode_features`` on the hybrid path with the fallback rate
    made measurable: adds a ``decode_fallback`` boolean column (True =
    the real decoder raised a known decode error and the deterministic
    fake dims were used). ``df.agg(avg(col("decode_fallback").cast
    ("int")))`` is the corpus' fake-dimension rate — the observability
    ADVICE r7 asked for."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dec = [
                hybrid_decode_flagged(c, m)
                for c, m in zip(pdf["content"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(c) for c in pdf["content"]],
                    "sha1": [hashlib.sha1(c).hexdigest() for c in pdf["content"]],
                    "width": [d[0] for d in dec],
                    "height": [d[1] for d in dec],
                    "n_channels": [d[2] for d in dec],
                    "decode_fallback": [d[3] for d in dec],
                }
            )

    return media.mapInPandas(run, schema=OBSERVED_SCHEMA)


def fake_decode_sha256(content: bytes) -> tuple[str, int, int, int, int, int]:
    """sha256-based deterministic fake decode. Unlike ``fake_decode``
    (sha1), every derived field is reproducible in engines that ship
    sha256 but not sha1 (DuckDB), so the mapInPandas decode path can be
    differential-tested end-to-end: (hex, width, height, channels,
    n_frames, duration_s)."""
    h = hashlib.sha256(content).digest()
    return (
        hashlib.sha256(content).hexdigest(),
        16 + h[0] % 240,
        16 + h[1] % 240,
        1 + h[2] % 4,
        1 + h[3] % 4,
        1 + h[4],
    )


CHECKED_SCHEMA = (
    "id long, n_bytes long, sha256 string, width int, height int, n_channels int"
)


def decode_features_checked(media: DataFrame) -> DataFrame:
    """Oracle-checkable variant of ``decode_features``: same Arrow-batched
    mapInPandas shape, sha256-derived pseudo-dims (see
    ``fake_decode_sha256``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dec = [fake_decode_sha256(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": [len(c) for c in pdf["content"]],
                    "sha256": [d[0] for d in dec],
                    "width": [d[1] for d in dec],
                    "height": [d[2] for d in dec],
                    "n_channels": [d[3] for d in dec],
                }
            )

    return media.mapInPandas(run, schema=CHECKED_SCHEMA)


FRAMES_SCHEMA = "id long, n_frames int, duration_s int, frame_idx int, t_ms long"


def sample_frames(media: DataFrame) -> DataFrame:
    """Deterministic frame sampling for video-like blobs: pseudo
    frame-count and duration from the content hash, frames evenly spaced
    (integer milliseconds, exact arithmetic). One input row fans out to
    n_frames output rows INSIDE the Arrow batch — the decode-side
    explode pattern (a real decoder yields frame tensors here; only the
    per-frame features leave the stage, the blob never shuffles)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nfs, durs, idxs, ts = [], [], [], [], []
            for i, c in zip(pdf["id"], pdf["content"]):
                _, _, _, _, n_frames, dur = fake_decode_sha256(c)
                for k in range(n_frames):
                    ids.append(i)
                    nfs.append(n_frames)
                    durs.append(dur)
                    idxs.append(k)
                    ts.append((k * dur * 1000) // n_frames)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_frames": nfs,
                    "duration_s": durs,
                    "frame_idx": idxs,
                    "t_ms": ts,
                }
            )

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


RESIZED_SCHEMA = (
    "id long, src_width int, src_height int, width int, height int, "
    "n_channels int, n_bytes long, content binary"
)


def resize_stub(content: bytes, n: int) -> bytes:
    """Deterministic stand-in for a real pixel resample: tile-or-truncate
    the source bytes to exactly ``n``. A real implementation feeds the
    decoded tensor to PIL.Image.resize / cv2.resize here; the stub keeps
    the byte-exact contract (output length == w*h*c) testable without
    media libraries."""
    if not content:
        return b"\x00" * n
    if len(content) >= n:
        return content[:n]
    reps = -(-n // len(content))
    return (content * reps)[:n]


def resize_images(
    media: DataFrame,
    width: int = 32,
    height: int = 32,
    decoder: Callable[[bytes, str], tuple[int, int, int]] = fake_decode,
) -> DataFrame:
    """Arrow-batched resize over (id, content, modality): each blob is
    'decoded' (stub dims from the content digest), resampled to
    width x height preserving channel count, and re-emitted as a binary
    column of exactly width*height*channels bytes. Runs map-side via
    mapInPandas — source and resized blobs stay in the scan stage and
    never shuffle; cap Arrow batch bytes with
    spark.sql.execution.arrow.maxRecordsPerBatch when blobs are large."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [
                decoder(c, m)
                for c, m in zip(pdf["content"], pdf["modality"])
            ]
            n_out = [width * height * d[2] for d in dims]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "src_width": [d[0] for d in dims],
                    "src_height": [d[1] for d in dims],
                    "width": width,
                    "height": height,
                    "n_channels": [d[2] for d in dims],
                    "n_bytes": n_out,
                    "content": [
                        resize_stub(c, n)
                        for c, n in zip(pdf["content"], n_out)
                    ],
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def decode_features_arrow(media: DataFrame) -> DataFrame:
    """``decode_features_checked`` on the mapInArrow path: RecordBatches
    arrive as pyarrow (no pandas materialization), binary buffers are
    read zero-copy, and the output batch is built columnar. For wide
    binary payloads this skips the Arrow->pandas->Arrow round trip that
    mapInPandas pays per batch — the preferred shape when the per-row
    work is byte-level (hashing, codec probing) rather than pandas
    vector math. Result-identical to ``decode_features_checked``
    (asserted in tests/test_ext.py)."""
    import pyarrow as pa

    def run(batches):
        for batch in batches:
            ids = batch.column("id")
            contents = batch.column("content")
            n_bytes, sha, w, h, c = [], [], [], [], []
            for buf in contents:
                data = buf.as_py()
                n_bytes.append(len(data))
                s, wi, hi, ch = fake_decode_sha256(data)[:4]
                sha.append(s)
                w.append(wi)
                h.append(hi)
                c.append(ch)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(n_bytes, pa.int64()),
                    pa.array(sha, pa.string()),
                    pa.array(w, pa.int32()),
                    pa.array(h, pa.int32()),
                    pa.array(c, pa.int32()),
                ],
                names=["id", "n_bytes", "sha256", "width", "height", "n_channels"],
            )

    return media.mapInArrow(run, schema=CHECKED_SCHEMA)
