"""Multimodal operator throughput at corpus scale (r10).

Generates a synthetic mixed-media corpus DISTRIBUTED (each executor
encodes its own payloads from seed ids via the repo's own fixture
writers — PNG, baseline JPEG, PCM16 WAV, Y4M), lands it as parquet, then
times every multimodal operator over it end-to-end through Spark:

    extract_features      real image decode -> luminance histograms
    resize_images         real decode -> box filter -> PNG re-encode
    image/audio/video_meta  header-cost inventory sniffing
    pcm_window_features   time-domain audio features
    spectral_window_features  rfft features
    video_frame_features  real Y4M frame sampling

This is the evidence that the multimodal surface is MEASURED, not just
unit-tested: payload generation is excluded from timings (corpus written
first, operators read it back), each timing is min-of-2 on a warm
session, and the printed JSON records rows/sec plus decode fractions.

Usage: python scripts/media_benchmark.py [n_per_kind]  (default 2000)
Record the numbers in SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vectrekker_spark.session import get_spark  # noqa: E402

IMG = 128  # image side; typical web-thumbnail scale
WAV_SAMPLES = 32_000  # 2 s at 16 kHz
Y4M_FRAMES = 10
Y4M_SIDE = 64


def _gen(batches):
    import numpy as np
    import pandas as pd

    from vectrekker_spark.functions.bmpcodec import encode_bmp
    from vectrekker_spark.functions.gifcodec import encode_gif
    from vectrekker_spark.functions.imagecodec import encode_png
    from vectrekker_spark.functions.jpegcodec import (
        encode_jpeg,
        encode_progressive_jpeg,
    )
    from vectrekker_spark.functions.flaccodec import encode_flac
    from vectrekker_spark.functions.mp4codec import build_mp4
    from vectrekker_spark.functions.webpcodec import encode_webp
    from vectrekker_spark.functions.videocodec import encode_y4m

    def wav_bytes(seed: int) -> bytes:
        import struct

        t = np.arange(WAV_SAMPLES)
        f = 100 + (seed % 50) * 37
        pcm = (0.4 * np.sin(2 * np.pi * f * t / 16000) * 32767).astype("<i2")
        data = pcm.tobytes()
        fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
        return (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )

    def image(seed: int):
        yy, xx = np.mgrid[0:IMG, 0:IMG]
        return np.stack(
            [
                (yy * 3 + seed * 7) % 256,
                (xx * 5 + seed * 13) % 256,
                ((yy + xx) * 2 + seed) % 256,
            ],
            axis=2,
        ).astype(np.uint8)

    def y4m_bytes(seed: int) -> bytes:
        yy, xx = np.mgrid[0:Y4M_SIDE, 0:Y4M_SIDE]
        frames = [
            np.stack(
                [
                    (yy * 4 + seed + t * 9) % 256,
                    (xx * 4 + t * 3) % 256,
                    ((yy + xx) * 2 + seed + t) % 256,
                ],
                axis=2,
            ).astype(np.uint8)
            for t in range(Y4M_FRAMES)
        ]
        return encode_y4m(frames, fps=(25, 1), colorspace="420jpeg")

    def ogg_bytes(seed: int) -> bytes:
        """Spec-built Ogg-Opus: BOS ident page + data pages with real-ish
        granule progression (sniff-only kind — payload is opaque)."""
        import struct

        def page(seq, payload, htype=0, granule=0):
            n, last = divmod(len(payload), 255)
            table = bytes([255] * n + [last])
            return (b"OggS" + bytes([0, htype])
                    + granule.to_bytes(8, "little", signed=True)
                    + (7).to_bytes(4, "little") + seq.to_bytes(4, "little")
                    + b"\x00" * 4 + bytes([len(table)]) + table + payload)

        head = (b"OpusHead" + bytes([1, 1 + seed % 2])
                + (312).to_bytes(2, "little")
                + (48000).to_bytes(4, "little") + b"\x00\x00\x00")
        total = 48000 * (1 + seed % 5) + 312
        return (page(0, head, htype=0x02)
                + page(1, b"OpusTags" + struct.pack("<I", 0) * 2)
                + page(2, bytes((seed + i) % 256 for i in range(800)),
                       granule=total // 2)
                + page(3, bytes((seed + i) % 251 for i in range(800)),
                       htype=0x04, granule=total))

    def webm_bytes(seed: int) -> bytes:
        """Spec-built WebM: EBML header + Segment(Info, video+audio
        Tracks, one opaque Cluster) — sniff-only kind."""
        import struct

        def esz(n):
            return bytes([0x80 | n]) if n < 0x7F else bytes(
                [0x40 | (n >> 8), n & 0xFF])

        def el(eid, payload):
            return eid + esz(len(payload)) + payload

        def u(n):
            return n.to_bytes(max(1, (n.bit_length() + 7) // 8), "big")

        info = el(b"\x15\x49\xa9\x66",
                  el(b"\x2a\xd7\xb1", u(1_000_000))
                  + el(b"\x44\x89", struct.pack(">f", 1000.0 * (1 + seed % 30))))
        vtrack = el(b"\xae", el(b"\x83", u(1)) + el(b"\x86", b"V_VP9")
                    + el(b"\x23\xe3\x83", u(40_000_000))
                    + el(b"\xe0", el(b"\xb0", u(640)) + el(b"\xba", u(360))))
        atrack = el(b"\xae", el(b"\x83", u(2)) + el(b"\x86", b"A_OPUS")
                    + el(b"\xe1", el(b"\xb5", struct.pack(">f", 48000.0))
                         + el(b"\x9f", u(2))))
        cluster = el(b"\x1f\x43\xb6\x75",
                     bytes((seed + i) % 256 for i in range(1500)))
        return (el(b"\x1a\x45\xdf\xa3", el(b"\x42\x82", b"webm"))
                + el(b"\x18\x53\x80\x67",
                     info + el(b"\x16\x54\xae\x6b", vtrack + atrack) + cluster))

    def gif_bytes(seed: int) -> bytes:
        rng = np.random.RandomState(seed % 1000)
        pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
        return encode_gif(
            (image(seed)[:, :, 0] % 16).astype(np.uint8), pal
        )

    kinds = {
        0: ("png", lambda s: encode_png(image(s))),
        1: ("jpeg", lambda s: encode_jpeg(image(s), quality=85, subsampling="4:2:0")),
        2: ("wav", wav_bytes),
        3: ("y4m", y4m_bytes),
        # r11 additions: the new real-decode formats ride the same corpus
        4: ("pjpeg", lambda s: encode_progressive_jpeg(
            image(s), quality=85, subsampling="4:2:0")),
        5: ("gif", gif_bytes),
        6: ("bmp", lambda s: encode_bmp(image(s))),
        7: ("mp4", lambda s: build_mp4(
            brand="isom", timescale=600, duration=600 * (1 + s % 30),
            tracks=[dict(handler="vide", width=640, height=360, codec="avc1",
                         media_timescale=30000,  # r12: stts → exact fps/frames
                         stts=[(30 * (1 + s % 30), 1001)])])),
        8: ("flac", lambda s: encode_flac(  # r12: real compressed audio
            (0.4 * np.sin(2 * np.pi * (100 + (s % 50) * 37)
                          * np.arange(WAV_SAMPLES) / 16000) * 32767)
            .astype(np.int64),
            rate=16000, strategy="fixed2", block_size=4096)),
        9: ("webp", lambda s: encode_webp(  # r12: lossless VP8L decode
            image(s), subtract_green=True, cache_bits=6, use_lz77=True)),
        # r13: Ogg-Opus + WebM — sniff-only kinds (inventory coverage)
        10: ("ogg", lambda s: ogg_bytes(s)),
        11: ("webm", lambda s: webm_bytes(s)),
    }
    for pdf in batches:
        rows = []
        for mid in pdf["id"]:
            kind, enc = kinds[int(mid) % len(kinds)]
            rows.append((int(mid), kind, enc(int(mid))))
        yield pd.DataFrame(rows, columns=["media_id", "kind", "content"])


def main() -> int:
    n_per_kind = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    total = n_per_kind * 12  # r13: ogg + webm sniff-only kinds joined
    work = tempfile.mkdtemp(prefix="media_bench_")
    spark = get_spark(app_name="media-benchmark")

    from vectrekker_spark.operators.multimodal import (
        audio_meta,
        extract_features,
        image_meta,
        pcm_window_features,
        resize_images,
        spectral_window_features,
        video_frame_features,
        video_meta,
    )

    report: dict = {"n_per_kind": n_per_kind, "total_payloads": total}
    try:
        t0 = time.time()
        corpus_path = os.path.join(work, "media")
        spark.range(total).repartition(32).mapInPandas(
            _gen, schema="media_id long, kind string, content binary"
        ).write.parquet(corpus_path)
        report["t_generate_sec"] = round(time.time() - t0, 2)
        media = spark.read.parquet(corpus_path)
        report["corpus_mb"] = round(
            sum(
                os.path.getsize(os.path.join(corpus_path, f))
                for f in os.listdir(corpus_path)
                if f.endswith(".parquet")
            )
            / 2**20,
            1,
        )
        images = media.where(
            F.col("kind").isin("png", "jpeg", "pjpeg", "gif", "bmp", "webp")
        )
        wavs = media.where(F.col("kind").isin("wav", "flac"))  # r12
        vids = media.where(F.col("kind") == "y4m")

        def timed(name, build, rows_base):
            build().count()  # warm
            best = None
            for _ in range(2):
                t0 = time.time()
                n = build().count()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            report[f"t_{name}_sec"] = round(best, 2)
            report[f"{name}_rows"] = n
            report[f"{name}_per_sec"] = round(rows_base / best, 1)

        timed("extract_features", lambda: extract_features(images), 6 * n_per_kind)
        dec = extract_features(images).agg(
            F.avg(F.col("decoded").cast("double"))
        ).first()[0]
        report["decoded_fraction"] = round(float(dec), 4)  # expect 1.0
        # per-kind decode rates for the r11 formats (one shared pass each)
        for k in ("pjpeg", "gif", "bmp", "webp"):
            one = media.where(F.col("kind") == k)
            timed(f"extract_{k}", lambda one=one: extract_features(one), n_per_kind)

        timed("resize", lambda: resize_images(images, factor=4), 6 * n_per_kind)
        # r12: perceptual dedup — the hash pass over every image kind,
        # then the banded pair join over the PERSISTED hashes (so the
        # pair timing measures the join, not a re-decode)
        from vectrekker_spark.operators.imagedup import (
            dhash_dedup_pairs,
            image_dhash,
        )

        timed("image_dhash", lambda: image_dhash(images), 6 * n_per_kind)
        hashes_path = os.path.join(work, "hashes")
        image_dhash(images).write.parquet(hashes_path)
        hashes = spark.read.parquet(hashes_path)
        t0 = time.time()
        n_pairs = dhash_dedup_pairs(hashes, max_hamming=6).count()
        report["t_dhash_pairs_sec"] = round(time.time() - t0, 2)
        report["dhash_pairs_found"] = n_pairs
        # count() alone would let Catalyst PRUNE the deterministic sniff
        # UDF entirely (empirically confirmed: a raising UDF still counts
        # fine) — filter on a sniffed column so every row's sniff actually
        # executes, and the timing measures real work (r10 review finding)
        timed(
            "image_meta",
            lambda: image_meta(media).where(F.col("img_format").isNotNull()),
            total,
        )
        timed(
            "audio_meta",
            lambda: audio_meta(media).where(F.col("aud_rate").isNotNull()),
            total,
        )
        timed(
            "video_meta",
            lambda: video_meta(media).where(F.col("vid_format").isNotNull()),
            total,
        )
        timed(
            "pcm_features",
            lambda: pcm_window_features(wavs, window=1024),
            2 * n_per_kind,
        )
        timed(
            "spectral_features",
            lambda: spectral_window_features(wavs, window=1024),
            2 * n_per_kind,
        )
        # FLAC decode throughput alone (rice/LPC per-sample Python cost)
        flacs = media.where(F.col("kind") == "flac")
        timed(
            "pcm_features_flac",
            lambda: pcm_window_features(flacs, window=1024),
            n_per_kind,
        )
        timed(
            "video_frames",
            lambda: video_frame_features(vids, every_n=2),
            n_per_kind,
        )
        vdec = video_frame_features(vids, every_n=2).agg(
            F.avg(F.col("decoded").cast("double"))
        ).first()[0]
        report["video_decoded_fraction"] = round(float(vdec), 4)

        # r13: the mixed-corpus inventory must not be NULL for the new
        # sniff-only kinds — per-kind meta coverage as explicit gates
        ogg_cov = audio_meta(media.where(F.col("kind") == "ogg")).agg(
            F.avg(F.col("aud_format").startswith("ogg").cast("double")),
            F.avg(F.col("aud_duration").isNotNull().cast("double")),
        ).first()
        report["ogg_meta_coverage"] = round(float(ogg_cov[0]), 4)
        report["ogg_duration_coverage"] = round(float(ogg_cov[1]), 4)
        webm_cov = video_meta(media.where(F.col("kind") == "webm")).agg(
            F.avg((F.col("vid_format") == "webm").cast("double")),
            F.avg(F.col("vid_width").isNotNull().cast("double")),
        ).first()
        report["webm_meta_coverage"] = round(float(webm_cov[0]), 4)
        report["webm_dims_coverage"] = round(float(webm_cov[1]), 4)

        print(json.dumps(report))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
