"""Hypothesis property tests for the driver-side pure kernels — the
pieces whose contracts hold for ALL inputs, not just fixtures: the
perceptual-hash helpers (invariance theorems), the stdlib PNG decode
(writer/reader roundtrip), and the REST wire-format parse. These run
without a SparkSession, so hundreds of generated examples stay cheap.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

GRID = st.lists(
    st.integers(min_value=0, max_value=255), min_size=72, max_size=72
)
SEQ65 = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=65, max_size=65
)


@given(GRID, st.integers(1, 5), st.integers(0, 100))
@settings(max_examples=200, deadline=None)
def test_dhash_invariant_under_positive_affine_pixel_maps(grid, a, b):
    """dHash compares neighbors, so ANY strictly-increasing pixel map
    (here integer x -> a*x + b with a >= 1) preserves every comparison
    and hence the hash — the brightness/contrast invariance that makes
    it a perceptual signature rather than a checksum."""
    from mcyj_datapipeline_spark.operators.multimodal import (
        _dhash_from_grid,
    )

    assert _dhash_from_grid(grid) == _dhash_from_grid(
        [a * x + b for x in grid]
    )


@given(GRID)
@settings(max_examples=200, deadline=None)
def test_dhash_stays_in_signed_int64(grid):
    from mcyj_datapipeline_spark.operators.multimodal import (
        _dhash_from_grid,
    )

    h = _dhash_from_grid(grid)
    assert -(1 << 63) <= h < (1 << 63)


@given(SEQ65, st.integers(1, 7), st.integers(0, 1000))
@settings(max_examples=200, deadline=None)
def test_audio_fingerprint_loudness_invariance_is_universal(seq, a, b):
    """The sign-of-delta fingerprint is invariant under any positive
    affine gain applied to the frame energies — for every sequence,
    not just the fixture melodies."""
    from mcyj_datapipeline_spark.operators.multimodal import (
        _bits64_from_seq,
    )

    assert _bits64_from_seq(seq) == _bits64_from_seq(
        [a * x + b for x in seq]
    )


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=255),
)
@settings(max_examples=100, deadline=None)
def test_png_writer_decoder_roundtrip_constant(width, height, value):
    """synth writer -> stdlib decoder roundtrip: every constant
    grayscale image decodes to exactly its dimensions and pixels."""
    from mcyj_datapipeline_spark.operators.multimodal import (
        _png_gray_pixels,
        synth_gray_png,
    )

    w, h, rows = _png_gray_pixels(synth_gray_png(width, height, value))
    assert (w, h) == (width, height)
    assert all(len(r) == width and all(p == value for p in r) for r in rows)


@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=1, max_value=60),
)
@settings(max_examples=150, deadline=None)
def test_rest_page_payload_parse_roundtrip(page, page_size):
    """The synthetic REST wire format parses back to exactly page_size
    rows with globally-unique, page-consistent agency ids — for every
    page/page_size, so offset arithmetic bugs can't hide in untested
    corners of the id space."""
    from mcyj_datapipeline_spark.sources import (
        _parse_page,
        synth_page_payload,
    )

    rows = list(_parse_page(page, synth_page_payload(page, page_size)))
    assert len(rows) == page_size
    for idx, (p, agency_id, name, status, cap) in enumerate(rows):
        i = page * page_size + idx
        assert p == page
        assert agency_id == "AG%05d" % i
        assert status in ("ACTIVE", "PENDING", "CLOSED")
        assert 0 <= cap < 200


@given(st.lists(st.text(alphabet="ab ", max_size=12), max_size=8))
@settings(max_examples=150, deadline=None)
def test_brute_span_reference_merge_rule_is_sound(texts):
    """Pure-python sanity for the span merge rule used by the brute
    reference in the randomized cross-check: merged spans never
    overlap, are sorted, and each covers >= n words."""
    n = 2
    docs = list(enumerate(texts))
    grams = {}
    for did, text in docs:
        ws = text.split()
        for p in range(1, len(ws) - n + 2):
            grams.setdefault(" ".join(ws[p - 1 : p - 1 + n]), set()).add(did)
    dup = {g for g, ds in grams.items() if len(ds) >= 2}
    for did, text in docs:
        ws = text.split()
        hits = [
            p
            for p in range(1, len(ws) - n + 2)
            if " ".join(ws[p - 1 : p - 1 + n]) in dup
        ]
        spans = []
        cur = None
        for p in hits:
            if cur and p - cur[1] <= n:
                cur = (cur[0], p)
            else:
                if cur:
                    spans.append((cur[0], cur[1] + n - 1))
                cur = (p, p)
        if cur:
            spans.append((cur[0], cur[1] + n - 1))
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 < s2, "overlapping merged spans"
        for s, e in spans:
            assert e - s + 1 >= n
            assert 1 <= s and e <= len(ws)
