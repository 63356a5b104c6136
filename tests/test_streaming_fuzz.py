"""CI pin for the streaming differential fuzzer
(scripts/streaming_fuzz.py, r12 — the ST7-ST10 counterpart of
test_diff_fuzz/test_kernel_fuzz): one fixed-seed trial per family at
fixture scale, so generator drift or a streaming-plumbing regression
(checkpoint dedup, persisted-state reuse, write ordering, heal paths,
compacts) fails here first, not in a round's exploratory campaign.

The trials randomize batch splits, redelivery injections (mid-stream and
end, fresh checkpoints), and torn-bloom injections, then compare against
batch-side oracles built from the same operators with none of the
streaming machinery (see the script docstring for the per-family oracle
and why quota checks invariants instead of a kept-set)."""

from __future__ import annotations

from scripts.streaming_fuzz import fuzz


def test_streaming_fuzz_fixed_seed_all_families(spark, tmp_path):
    failures = fuzz(
        spark,
        n=1,
        seed=7,
        out_dir=str(tmp_path / "fuzz_failures"),
        keep_going=True,
    )
    assert failures == []

import pytest  # noqa: E402  (slow marker below)

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
