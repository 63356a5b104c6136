"""Multimodal (image/audio/video) column plumbing for training-data
pipelines: opaque `binary` payloads + typed metadata, processed via
Arrow-batched `mapInPandas`.

The media libraries (PIL/torchaudio/ffmpeg) are NOT in this container, but
image decode is REAL anyway for the formats the pure-numpy micro-decoders
cover (8-bit non-interlaced PNG + binary PPM in functions/imagecodec.py,
baseline sequential JPEG in functions/jpegcodec.py):
`decode_image` prefers PIL when importable, falls back to the
micro-decoder (returning an (H, W, C) uint8 array), and raises
NotImplementedError only for formats neither covers. `extract_features`
decodes per payload (luminance-histogram features, decoded=true) with
`byte_histogram_features` as the byte-level fallback for everything else
(decoded=false) — mixed corpora classify rather than abort. PCM audio
features are likewise real (numpy over the raw samples), FLAC is decoded
for real since r12 (functions/flaccodec — fixed/LPC prediction,
partitioned Rice, CRC-verified), and video frame sampling is real for
Y4M streams (functions/videocodec) — only lossy-compressed audio/video
(mp3/mp4/webm) stays out of scope; a real pipeline transcodes those with
ffmpeg upstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = "media_id long, n_bytes long, decoded boolean, features array<double>"


def decode_image(content: bytes):
    """Decode an image payload. Prefers PIL (returns a PIL.Image); without
    it, falls back to the pure-numpy micro-decoders (PNG/PPM in
    functions/imagecodec.py, baseline JPEG in functions/jpegcodec.py;
    returns an (H, W, C) uint8 ndarray) so a real decode still runs
    end-to-end in library-less environments. Payloads in a format the
    micro-decoders don't cover raise NotImplementedError."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError:
        from vectrekker_spark.functions.imagecodec import (  # noqa: PLC0415
            decode_image_array,
        )

        arr = decode_image_array(content)
        if arr is not None:
            return arr
        raise NotImplementedError(
            "image decode without PIL covers 8-bit non-interlaced PNG, "
            "binary PPM (functions/imagecodec.py) and baseline sequential "
            "JPEG (functions/jpegcodec.py); this payload is none of those "
            "— install PIL or use byte_histogram_features"
        )
    import io

    return Image.open(io.BytesIO(content))


def _lum_hist(arr: "np.ndarray", n_bins: int) -> list[float] | None:
    """L1-normalized luminance histogram of an (H, W, C) uint8 array —
    the ONE pixel-feature kernel (image and video features share it; two
    copies of the binning/luma math would silently diverge). ITU-R 601
    luma for color; alpha (channels 2/4) never weighs in. None for an
    empty pixel set (zero-dimension guard)."""
    if arr.shape[2] >= 3:
        lum = (
            0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
        )
    else:
        lum = arr[:, :, 0].astype(np.float64)
    hist = np.bincount(
        np.minimum(lum.astype(np.int64) * n_bins // 256, n_bins - 1).ravel(),
        minlength=n_bins,
    ).astype(np.float64)
    tot = hist.sum()
    return (hist / tot).tolist() if tot > 0 else None


def image_pixel_features(content: bytes, n_bins: int = 16) -> list[float] | None:
    """REAL decoded-pixel features: L1-normalized luminance histogram over
    the decoded image (PNG/PPM/baseline-JPEG via the numpy micro-decoders
    — no media library needed). None when the payload isn't decodable;
    callers fall back to the byte-level stand-in. Same shape/normalization
    as byte_histogram_features, so the two interchange downstream."""
    from vectrekker_spark.functions.imagecodec import decode_image_array

    arr = decode_image_array(content)
    if arr is None:
        return None
    return _lum_hist(arr, n_bins)


def byte_histogram_features(content: bytes, n_bins: int = 16) -> list[float]:
    """Deterministic fake 'decoder': L1-normalized histogram of byte values.
    Stands in for decode→resize→feature-extract so the Spark plumbing is
    exercised end-to-end without media libs."""
    if not content:
        return [0.0] * n_bins
    arr = np.frombuffer(content, dtype=np.uint8)
    hist = np.bincount(arr // (256 // n_bins), minlength=n_bins).astype(np.float64)
    return (hist / hist.sum()).tolist()


def extract_features(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow streams each partition as pandas batches; per-batch python cost is
    amortized, nothing is collected to the driver, and partitioning is
    preserved — the pattern a real decoder would drop into.

    Per payload: a REAL pixel decode (PNG/PPM/baseline-JPEG via the numpy
    micro-decoders, no media library required) produces a luminance
    histogram and
    ``decoded=true``; undecodable payloads fall back to the byte-histogram
    stand-in with ``decoded=false``, so mixed corpora never crash the batch
    (the reference's quarantine philosophy, vectrekker/main.py:175-178,
    applied to media: classify, don't abort)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def feats(b):
            px = image_pixel_features(b or b"")
            return (True, px) if px is not None else (
                False, byte_histogram_features(b or b"")
            )

        for pdf in batches:
            pairs = pdf[content_col].map(feats)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": pdf[content_col].map(lambda b: len(b) if b is not None else 0),
                    "decoded": pairs.map(lambda p: p[0]),
                    "features": pairs.map(lambda p: p[1]),
                }
            )

    return df.mapInPandas(gen, schema=FEATURE_SCHEMA)


def strided_downsample(content: bytes, factor: int = 4) -> bytes:
    """Deterministic 'resize' stand-in: keep every ``factor``-th byte. Swaps
    cleanly for a PIL `Image.resize` when the lib exists; the Spark-side
    contract (binary→smaller binary, same mapInPandas shape) is identical.
    Since r10 this is only the LAST fallback — payloads the micro-decoders
    understand get a REAL pixel resize via ``micro_resize``."""
    return bytes(content[::factor]) if content else b""


def downsample_area(arr: "np.ndarray", factor: int) -> "np.ndarray":
    """Area-average (box-filter) downsample by an integer factor: the
    correct decimation filter for corpus thumbnails (plain striding
    aliases). Edge-replicates to a factor multiple, so the output is
    (ceil(H/f), ceil(W/f), C) uint8."""
    if factor < 1:
        raise ValueError(f"downsample_area: factor must be >= 1, got {factor}")
    if factor == 1:
        return arr
    h, w, c = arr.shape
    ph, pw = -(-h // factor) * factor, -(-w // factor) * factor
    a = np.pad(
        arr, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge"
    ).astype(np.float64)
    out = a.reshape(ph // factor, factor, pw // factor, factor, c).mean(
        axis=(1, 3)
    )
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def micro_resize(content: bytes, factor: int = 4) -> bytes | None:
    """REAL no-PIL resize for payloads the micro-decoders understand
    (PNG/PPM/baseline JPEG): decode → area-average downsample → re-encode
    as PNG (the lossless, always-writable output format of the micro
    codecs). None when the payload isn't decodable — callers fall back to
    the byte-level stand-in, the extract_features classification idiom."""
    from vectrekker_spark.functions.imagecodec import (  # noqa: PLC0415
        decode_image_array,
        encode_png,
    )

    arr = decode_image_array(content)
    if arr is None:
        return None
    return encode_png(downsample_area(arr, factor))


def resize_images(
    df: DataFrame, factor: int = 4,
    content_col: str = "content", id_col: str = "media_id",
) -> DataFrame:
    """mapInPandas resize: real `PIL.Image.resize` when PIL is importable;
    without PIL, a REAL pixel resize anyway for formats the micro-decoders
    cover (decode → area-average → PNG re-encode, ``micro_resize``), and
    the deterministic strided-downsample stand-in only for payloads
    nothing can decode (same schema/batch shape throughout, so swapping
    decoders changes no plumbing). Note the output format differs by
    branch: PIL preserves the source format, the micro path always writes
    PNG, and its dims are ceil(h/f) (edge-padded box filter) vs PIL's
    floor.

    PIL availability is probed INSIDE the UDF, i.e. on the executor that
    runs each batch — a driver-side probe would pick the wrong branch on
    clusters where driver and executor images differ. The output keeps the
    caller's id column name and type.
    """
    id_type = dict(df.dtypes)[id_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # worker-side probe: this code runs on the executor
            import io

            from PIL import Image  # noqa: PLC0415

            def do(b):  # pragma: no cover - env-dependent
                img = Image.open(io.BytesIO(b))
                small = img.resize((max(1, img.width // factor),
                                    max(1, img.height // factor)))
                out = io.BytesIO()
                small.save(out, format=img.format or "PNG")
                return out.getvalue()
        except ImportError:
            def do(b):
                out = micro_resize(b, factor)
                return out if out is not None else strided_downsample(b, factor)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content": pdf[content_col].map(lambda b: do(b) if b else b""),
                }
            )

    return df.mapInPandas(gen, schema=f"`{id_col}` {id_type}, content binary")


PCM_FEATURE_SCHEMA = "media_id long, window_no long, rms double, zcr double"


def pcm_window_features(
    df: DataFrame, window: int = 1024,
    content_col: str = "content", id_col: str = "media_id",
) -> DataFrame:
    """REAL audio feature extraction (no external libs): per-window RMS
    energy and zero-crossing rate — the standard cheap audio features for
    corpus filtering (silence/noise gates). Arrow-batched numpy over
    mapInPandas; one output row per complete window, trailing partial
    windows dropped.

    Payload handling: a RIFF/WAVE container (the common corpus case) is
    parsed for real by functions/audiocodec.py — PCM16 samples extracted
    from the data chunk, multi-channel downmixed by mean. A payload that
    IS a WAV but in an encoding the parser doesn't cover (float32, 24-bit,
    WAVE_FORMAT_EXTENSIBLE, oversized data chunk) is SKIPPED — emitting no
    rows, like empty content — never reinterpreted: feeding its header and
    non-int16 sample bytes through the raw branch would fabricate
    plausible-looking garbage features. Only payloads with no RIFF/WAVE
    signature take the raw little-endian PCM16 interpretation (the
    historical contract). Worker-side classification per payload, so mixed
    corpora never crash the batch."""
    from vectrekker_spark.functions.audiocodec import is_wav, wav_mono_f64
    from vectrekker_spark.functions.flaccodec import flac_pcm16, is_flac

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, wins, rms, zcr = [], [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                if not content:
                    continue
                # no copy: the parser and frombuffer accept the Arrow
                # bytearray buffer directly
                if is_wav(content):
                    samples = wav_mono_f64(content)
                    if samples is None:
                        continue  # unsupported WAV encoding: classify, skip
                elif is_flac(content):
                    # r12: real FLAC sample decode (functions/flaccodec) —
                    # same downmix + scale as the WAV path, so features on
                    # a FLAC transcode equal features on the WAV original
                    try:
                        _rate, pcm = flac_pcm16(content)
                    except ValueError:
                        continue  # malformed FLAC: classify, skip
                    samples = (pcm.astype(np.float64) / 32768.0).mean(axis=1)
                else:
                    samples = np.frombuffer(
                        content[: (len(content) // 2) * 2], dtype="<i2"
                    ).astype(np.float64) / 32768.0
                n_win = len(samples) // window
                if n_win == 0:
                    continue
                w = samples[: n_win * window].reshape(n_win, window)
                ids.extend([mid] * n_win)
                wins.extend(range(n_win))
                rms.extend(np.sqrt((w * w).mean(axis=1)).round(6))
                signs = np.signbit(w)
                zcr.extend(
                    (signs[:, 1:] != signs[:, :-1]).mean(axis=1).round(6)
                )
            yield pd.DataFrame(
                {"media_id": ids, "window_no": wins, "rms": rms, "zcr": zcr}
            )

    return df.mapInPandas(gen, schema=PCM_FEATURE_SCHEMA)


SPECTRAL_FEATURE_SCHEMA = (
    "media_id long, window_no long, centroid double, rolloff double, "
    "flatness double, sample_rate int"
)


def spectral_window_features(
    df: DataFrame, window: int = 1024,
    content_col: str = "content", id_col: str = "media_id",
) -> DataFrame:
    """REAL frequency-domain audio features (numpy rfft, no external
    libs): per-window spectral centroid, 85% rolloff, and spectral
    flatness — the standard cheap discriminators for audio corpus
    curation (speech vs music vs noise vs silence gates; flatness ~1 is
    white noise, ~0 is tonal).

    Frequencies are NORMALIZED (cycles/sample, 0..0.5) so one column
    works for both payload kinds; ``sample_rate`` carries the WAV
    header's rate (NULL for raw PCM16 payloads, whose rate is unknown) —
    multiply to get Hz. Silent windows report centroid/rolloff 0 and
    flatness 1.0 (a flat zero spectrum), documented rather than NaN.

    Payload handling mirrors pcm_window_features exactly: RIFF/WAVE
    parsed for real (multi-channel mean-downmixed), unsupported WAV
    encodings SKIPPED (never reinterpreted), signatureless payloads taken
    as raw little-endian PCM16. One Arrow-batched mapInPandas pass."""
    from vectrekker_spark.functions.audiocodec import is_wav, parse_wav
    from vectrekker_spark.functions.flaccodec import flac_pcm16, is_flac

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct  # noqa: PLC0415 — parse_wav's failure surface

        freqs = np.fft.rfftfreq(window)  # cycles/sample, 0..0.5
        for pdf in batches:
            ids, wins, cents, rolls, flats, rates = [], [], [], [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                if not content:
                    continue
                rate = None
                if is_wav(content):
                    try:
                        rate, _ch, pcm = parse_wav(content)
                    except (ValueError, struct.error):
                        continue  # unsupported WAV encoding: classify, skip
                    if rate > 0x7FFFFFFF:
                        # fmt rate is a uint32 field; an out-of-int32 value
                        # would crash the Int32 sample_rate column (the
                        # sniff_wav_meta / imagecodec _checked lesson) —
                        # classify the payload as unsupported instead
                        continue
                    samples = (pcm.astype(np.float64) / 32768.0).mean(axis=1)
                elif is_flac(content):
                    try:
                        rate, pcm = flac_pcm16(content)
                    except ValueError:
                        continue  # malformed FLAC: classify, skip
                    if rate > 0x7FFFFFFF:
                        continue  # STREAMINFO rate is 20 bits, but keep the
                        # same Int32-bound discipline as the WAV arm
                    samples = (pcm.astype(np.float64) / 32768.0).mean(axis=1)
                else:
                    samples = np.frombuffer(
                        content[: (len(content) // 2) * 2], dtype="<i2"
                    ).astype(np.float64) / 32768.0
                n_win = len(samples) // window
                if n_win == 0:
                    continue
                w = samples[: n_win * window].reshape(n_win, window)
                mag = np.abs(np.fft.rfft(w, axis=1))
                total = mag.sum(axis=1)
                silent = total == 0
                safe_total = np.where(silent, 1.0, total)
                # centroid: magnitude-weighted mean frequency (the
                # librosa/standard convention)
                cent = (mag * freqs).sum(axis=1) / safe_total
                # rolloff: smallest normalized freq holding 85% of ENERGY
                # (squared magnitude — advice finding r10: the magnitude
                # cumsum this previously used is a different statistic
                # from the documented energy rolloff)
                energy = mag * mag
                etotal = energy.sum(axis=1)
                safe_etotal = np.where(silent, 1.0, etotal)
                cum = np.cumsum(energy, axis=1)
                roll_idx = np.argmax(cum >= 0.85 * safe_etotal[:, None], axis=1)
                roll = freqs[roll_idx]
                # flatness: geometric/arithmetic mean of the power
                # spectrum; the epsilon keeps log finite on exact-zero
                # bins without moving non-silent values measurably
                power = energy + 1e-30
                flat = np.exp(np.log(power).mean(axis=1)) / power.mean(axis=1)
                cent = np.where(silent, 0.0, cent)
                roll = np.where(silent, 0.0, roll)
                flat = np.where(silent, 1.0, flat)
                ids.extend([mid] * n_win)
                wins.extend(range(n_win))
                cents.extend(np.round(cent, 6))
                rolls.extend(np.round(roll, 6))
                flats.extend(np.round(flat, 6))
                rates.extend([rate] * n_win)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "window_no": wins,
                    "centroid": cents,
                    "rolloff": rolls,
                    "flatness": flats,
                    "sample_rate": pd.array(rates, dtype="Int32"),
                }
            )

    return df.mapInPandas(gen, schema=SPECTRAL_FEATURE_SCHEMA)


VIDEO_FRAME_SCHEMA = (
    "media_id long, frame_no long, decoded boolean, features array<double>"
)


def video_frame_features(
    df: DataFrame, every_n: int = 10, n_bins: int = 16,
    content_col: str = "content", id_col: str = "media_id",
) -> DataFrame:
    """REAL video frame sampling + feature extraction, no media library:
    Y4M payloads (functions/videocodec — the uncompressed interchange
    format every codec toolchain pipes) decode every ``every_n``-th frame
    to pixels and emit its L1-normalized luminance histogram with
    ``decoded=true``; payloads no parser understands fall back to the
    byte-histogram over frame_sample_plan-style fixed byte windows with
    ``decoded=false`` — mixed corpora classify, never abort (the
    extract_features contract, per frame). One narrow mapInPandas pass;
    rows explode per sampled frame, nothing touches the driver."""
    if every_n < 1:
        raise ValueError(f"video_frame_features: every_n must be >= 1, got {every_n}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vectrekker_spark.functions import videocodec as vc

        def rows_for(mid, b):
            b = b or b""
            if vc.is_y4m(b):
                # decoded rows BUFFER until the whole walk succeeds: a
                # marker desync mid-stream must not leave decoded=true
                # rows for early frames AND then re-emit the same payload
                # through the byte fallback (duplicate, conflicting
                # frame_no keys — review finding r10). One payload gets
                # exactly one classification.
                try:
                    params, _ = vc.parse_y4m_header(b)
                    decoded = []
                    for i, off in vc.iter_y4m_frames(b):
                        if i % every_n:
                            continue
                        # O(1) decode at the walk's own offset — re-walking
                        # via decode_y4m_frame(b, i) was O(frames²)
                        feats = _lum_hist(
                            vc.decode_y4m_frame_at(b, params, off), n_bins
                        )
                        if feats is not None:
                            decoded.append((mid, i, True, feats))
                    return decoded
                except ValueError:
                    pass  # malformed: classify the WHOLE payload below
            # byte-window fallback: every_n-th 1024-byte window
            return [
                (mid, i, False, byte_histogram_features(
                    b[i * 1024 : (i + 1) * 1024], n_bins
                ))
                for i in range(0, len(b) // 1024, every_n)
            ]

        for pdf in batches:
            out = [
                r
                for mid, b in zip(pdf[id_col], pdf[content_col])
                for r in rows_for(mid, b)
            ]  # rows_for returns a fully-materialized classification
            yield pd.DataFrame(
                out, columns=["media_id", "frame_no", "decoded", "features"]
            )

    return df.mapInPandas(gen, schema=VIDEO_FRAME_SCHEMA)


VIDEO_META_SCHEMA = (
    "format string, width int, height int, fps double, colorspace string, "
    "n_frames int, duration_sec double, codec string, n_tracks int, "
    "brand string"
)


def _sniff_any_video(content: bytes) -> dict | None:
    """Unified video sniff: Y4M (full stream parameters — it's raw, so
    fps/frame count are knowable at header cost) else MP4/ISO-BMFF
    (r11: brand, duration, dims, track count, sample-entry fourcc;
    r12: EXACT fps/frame count from the stts/stsz sample tables against
    the mdhd media timescale — tracks without sample tables report NULL,
    never an estimate)."""
    from vectrekker_spark.functions.mp4codec import sniff_mp4_meta
    from vectrekker_spark.functions.videocodec import sniff_video_meta
    from vectrekker_spark.functions.webmcodec import sniff_webm_meta

    m = sniff_video_meta(content)
    if m is not None:
        # Y4M is uncompressed planar data: one "track", no codec branding
        return {**m, "codec": "rawvideo", "n_tracks": 1, "brand": None}
    m = sniff_mp4_meta(content)
    if m is not None:
        return m
    # r13: WebM/Matroska (EBML walk — dims/codec/duration/track count at
    # header cost, Clusters skipped by declared size, never read)
    return sniff_webm_meta(content)


def video_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach video container parameters as vid_format / vid_width /
    vid_height / vid_fps / vid_colorspace / vid_frames / vid_duration /
    vid_codec / vid_tracks / vid_brand — header walks only, pixel data
    untouched. Y4M streams report everything (functions/videocodec
    .sniff_video_meta: frame data is seeked over at its declared fixed
    size); MP4/ISO-BMFF files report brand/duration/dims/track-count/
    codec-fourcc from the box headers (functions/mp4codec.sniff_mp4_meta)
    plus, since r12, EXACT vid_fps/vid_frames from the first video
    track's stts/stsz sample tables (NULL for tracks without them —
    NULL-ness no longer distinguishes mp4 from y4m rows; use vid_format).
    Unrecognized, corrupt, and NULL payloads yield NULLs, the
    image_meta/audio_meta inventory contract."""
    return _attach_meta(
        df,
        content_col,
        _sniff_any_video,
        VIDEO_META_SCHEMA,
        {
            "format": None,
            "width": "Int32",
            "height": "Int32",
            "fps": "Float64",
            "colorspace": None,
            "n_frames": "Int32",
            "duration_sec": "Float64",
            "codec": None,
            "n_tracks": "Int32",
            "brand": None,
        },
        {
            "vid_format": "format",
            "vid_width": "width",
            "vid_height": "height",
            "vid_fps": "fps",
            "vid_colorspace": "colorspace",
            "vid_frames": "n_frames",
            "vid_duration": "duration_sec",
            "vid_codec": "codec",
            "vid_tracks": "n_tracks",
            "vid_brand": "brand",
        },
        "__vid_meta",
        "video_meta",
    )


def frame_sample_plan(
    df: DataFrame, every_n: int = 10, frame_size: int = 1024,
    content_col: str = "content", id_col: str = "media_id",
) -> DataFrame:
    """'Video' frame sampling over an opaque byte stream: treat the payload as
    fixed-size frames, keep every n-th. A real implementation swaps the byte
    slicing for a container-aware reader; the explode/partition shape is
    identical. Pure expressions — no Python per row."""
    n_frames = F.floor(F.octet_length(content_col) / frame_size)
    # payloads with zero complete frames (short or null content) emit no rows
    idx = F.when(
        n_frames > 0, F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    ).otherwise(F.array().cast("array<bigint>"))
    return df.select(
        F.col(id_col),
        F.posexplode(idx).alias("sample_idx", "frame_no"),
    ).select(
        id_col,
        "frame_no",
        (F.col("frame_no") * frame_size).alias("byte_offset"),
    )


IMAGE_META_SCHEMA = (
    "format string, width int, height int, n_frames int, is_animated boolean"
)


def _attach_meta(
    df: DataFrame,
    content_col: str,
    sniff_fn,
    udf_schema: str,
    field_dtypes: dict,
    out_cols: dict,
    tmp: str,
    op_name: str,
) -> DataFrame:
    """The ONE header-sniffing operator scaffold (image_meta and
    audio_meta share it — the clash guard, temp-struct attach, and column
    fan-out must behave identically across *_meta operators): sniff each
    payload with ``sniff_fn`` (None-safe), build the struct column, explode
    it into ``out_cols`` (output name → struct field), refuse to overwrite
    any caller column."""
    from pyspark.sql.functions import pandas_udf

    clash = ({tmp} | set(out_cols)) & set(df.columns)
    if clash:
        raise ValueError(
            f"input already has column(s) {sorted(clash)} — rename them "
            f"({op_name} writes {sorted(out_cols)} and would overwrite)"
        )

    @pandas_udf(udf_schema)
    def sniff(content: pd.Series) -> pd.DataFrame:
        metas = [sniff_fn(c) if c is not None else None for c in content]
        cols = {}
        for field, dt in field_dtypes.items():
            vals = [m[field] if m else None for m in metas]
            cols[field] = pd.array(vals, dtype=dt) if dt else vals
        return pd.DataFrame(cols)

    out = df.withColumn(tmp, sniff(F.col(content_col)))
    for out_name, field in out_cols.items():
        out = out.withColumn(out_name, F.col(f"{tmp}.{field}"))
    return out.drop(tmp)


def image_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach (img_format, img_width, img_height) sniffed from container
    headers — no decode, no media library (functions/imagecodec
    .sniff_image_meta: PNG/JPEG/GIF/BMP/PPM from the public specs).
    Unrecognized/corrupt/NULL payloads yield NULLs, never errors, so a
    mixed 100 TB corpus can be inventoried (format mix, resolution and
    aspect-ratio distributions, tiny-image filters) at header-read cost in
    one narrow Arrow pass.

    r13 animation inventory: img_frames / img_animated — stills report
    (1, false); animated GIFs count image descriptors via the sub-block
    walk (no LZW decode), animated WebPs count ANMF chunks, and APNGs
    report the acTL chunk's declared num_frames — exact when the
    container walk completes and NULL otherwise (never a guess).
    Perceptual dedup note: image_dhash/image_phash hash the FIRST frame
    of animated payloads — filter on img_animated when that's not the
    intended semantics (operators/imagedup.py docstring)."""
    from vectrekker_spark.functions.imagecodec import sniff_image_meta

    return _attach_meta(
        df,
        content_col,
        sniff_image_meta,
        IMAGE_META_SCHEMA,
        {"format": None, "width": "Int32", "height": "Int32",
         "n_frames": "Int32", "is_animated": "boolean"},
        {"img_format": "format", "img_width": "width",
         "img_height": "height", "img_frames": "n_frames",
         "img_animated": "is_animated"},
        "__img_meta",
        "image_meta",
    )


AUDIO_META_SCHEMA = (
    "format string, format_tag int, n_channels int, sample_rate int, "
    "bits int, data_bytes long, duration_sec double"
)


def audio_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach audio container parameters as aud_format / aud_format_tag /
    aud_channels / aud_rate / aud_bits / aud_bytes / aud_duration —
    header-read cost, sample data untouched. WAV (chunk walk), MP3
    (first MPEG Layer III frame after any ID3v2; duration exact via
    Xing/Info frame count, else the CBR estimate) and FLAC (STREAMINFO,
    exact duration) — r11, the mp4codec realism argument applied to
    audio. Unrecognized, corrupt, and NULL payloads yield NULLs; non-PCM
    and non-16-bit WAVs are REPORTED (the tag/bits columns say what they
    are) rather than errored, so a corpus inventory sees them."""
    from vectrekker_spark.functions.audiocodec import sniff_audio_meta

    return _attach_meta(
        df,
        content_col,
        sniff_audio_meta,
        AUDIO_META_SCHEMA,
        {
            "format": None,
            "format_tag": "Int32",
            "n_channels": "Int32",
            "sample_rate": "Int32",
            "bits": "Int32",
            "data_bytes": "Int64",
            "duration_sec": "Float64",
        },
        {
            "aud_format": "format",
            "aud_format_tag": "format_tag",
            "aud_channels": "n_channels",
            "aud_rate": "sample_rate",
            "aud_bits": "bits",
            "aud_bytes": "data_bytes",
            "aud_duration": "duration_sec",
        },
        "__aud_meta",
        "audio_meta",
    )
