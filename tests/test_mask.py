"""Golden tests for the SDAG block mask (reference ``SDAG.py:68-127``
semantics) and the O(L) metadata encoding."""

import numpy as np

from sdag_tpu.sdag.mask import (
    BlockLayout, build_blocked_causal_mask, layout_to_metadata,
    mask_from_metadata, neighbors_to_bitmask)


def _ref_mask(L, sys_user_len, doc_spans, qa_start, neighbors=None):
    """Independent re-statement of the reference's per-token loop
    (SDAG.py:104-127) as ground truth."""
    mask = np.zeros((L, L), dtype=bool)
    for i in range(sys_user_len):
        mask[i, :i + 1] = True
    nd = len(doc_spans)
    use = neighbors is not None and len(neighbors) == nd
    for d, (s, e) in enumerate(doc_spans):
        for i in range(s, e):
            mask[i, :sys_user_len] = True
            mask[i, s:i + 1] = True
            if use:
                for n in neighbors[d]:
                    if 0 <= n < nd:
                        ns, ne = doc_spans[n]
                        mask[i, ns:ne] = True
    for i in range(qa_start, L):
        mask[i, :i + 1] = True
    return mask


LAYOUT = BlockLayout(seq_len=30, sys_user_len=6,
                     doc_token_spans=((6, 11), (13, 18), (20, 24)),
                     qa_start=26)


def test_mask_matches_reference_semantics_no_neighbors():
    got = build_blocked_causal_mask(LAYOUT, reference_gap_rows=True)
    want = _ref_mask(30, 6, LAYOUT.doc_token_spans, 26)
    np.testing.assert_array_equal(got, want)


def test_mask_matches_reference_semantics_with_neighbors():
    nbrs = [[1], [0, 2], [5]]  # 5 is out of range -> ignored
    got = build_blocked_causal_mask(LAYOUT, doc_neighbors=nbrs,
                                    reference_gap_rows=True)
    want = _ref_mask(30, 6, LAYOUT.doc_token_spans, 26, nbrs)
    np.testing.assert_array_equal(got, want)
    # neighbor visibility is full-span (non-causal): doc0 token sees doc1's
    # *future* tokens
    assert got[6, 17]  # doc0 first token -> doc1 last token


def test_gap_rows_causal_in_production_mask():
    got = build_blocked_causal_mask(LAYOUT, reference_gap_rows=False)
    # gap token at 12 (between doc0 and doc1): causal row
    np.testing.assert_array_equal(got[12], np.arange(30) <= 12)
    # doc rows never attend gap tokens
    assert not got[14, 12]
    # all other rows identical to reference-semantics mask
    ref = build_blocked_causal_mask(LAYOUT, reference_gap_rows=True)
    gap = np.ones(30, bool)
    gap[:6] = False
    for s, e in LAYOUT.doc_token_spans:
        gap[s:e] = False
    gap[26:] = False
    np.testing.assert_array_equal(got[~gap], ref[~gap])


def test_isolation_no_cross_doc_attention():
    m = build_blocked_causal_mask(LAYOUT)
    # doc1 token cannot see doc0 tokens (strict isolation)
    assert not m[14, 6:11].any()
    # doc rows see sys/user prefix
    assert m[14, :6].all()
    # QA tail sees everything before it
    assert m[27, :28].all()


def test_metadata_mask_equals_dense_builder():
    for nbrs in (None, [[1], [0], [1]], [[2], [], [0, 1]]):
        dense = build_blocked_causal_mask(LAYOUT, doc_neighbors=nbrs)
        doc_id, bits, sul = layout_to_metadata(LAYOUT, doc_neighbors=nbrs)
        meta = mask_from_metadata(doc_id, bits, sul)
        np.testing.assert_array_equal(meta, dense)


def test_metadata_padding():
    doc_id, bits, sul = layout_to_metadata(LAYOUT, pad_to=64)
    assert doc_id.shape == (64,)
    assert (doc_id[30:] == -1).all()
    m = mask_from_metadata(doc_id, bits, sul, valid_len=30)
    assert not m[:, 30:].any() and not m[30:, :].any()


def test_neighbors_to_bitmask_excludes_self():
    bits = neighbors_to_bitmask([[0, 1, 2], [2]], 3)
    assert bits[0] == 0b110  # self (0) excluded
    assert bits[1] == 0b100


def test_mask_beyond_31_docs_isolation_only():
    """Plain isolation has no doc-count cap (exact doc-id equality): a
    40-doc layout's metadata mask must match an independent restatement
    built without any bit arithmetic."""
    import numpy as np
    from sdag_tpu.sdag.mask import (BlockLayout, layout_to_metadata,
                                    mask_from_metadata)

    n_docs, dl, sul = 40, 6, 10
    spans = tuple((sul + d * dl, sul + (d + 1) * dl) for d in range(n_docs))
    L = sul + n_docs * dl + 8
    layout = BlockLayout(L, sul, spans, qa_start=L - 8)
    doc_id, bits, got_sul = layout_to_metadata(layout)  # no neighbors
    assert doc_id.max() == n_docs - 1 and not bits.any()
    mask = mask_from_metadata(doc_id, bits, got_sul, valid_len=L)

    # independent restatement: integer comparisons only
    ref = np.zeros((L, L), bool)
    for i in range(L):
        for j in range(i + 1):
            di, dj = doc_id[i], doc_id[j]
            if di >= 0:
                ref[i, j] = (dj == di) or (dj == -1 and j < sul)
            else:
                ref[i, j] = True
    np.testing.assert_array_equal(mask, ref)


def test_mask_neighbors_beyond_cap_raises():
    from sdag_tpu.sdag.mask import BlockLayout, layout_to_metadata
    import pytest

    n_docs, dl, sul = 40, 4, 8
    spans = tuple((sul + d * dl, sul + (d + 1) * dl) for d in range(n_docs))
    L = sul + n_docs * dl
    layout = BlockLayout(L, sul, spans, qa_start=L)
    with pytest.raises(ValueError, match="neighbor windows"):
        layout_to_metadata(layout, doc_neighbors=[[1]] * n_docs)


def test_dense_golden_matches_metadata_on_holes_and_nbr_mismatch():
    """The dense golden builder must agree with the metadata mask on
    block-aligned (holed) layouts and on neighbor lists shorter/longer
    than the doc count (review audit: it used to ignore hole_spans
    entirely and drop ALL neighbors on a length mismatch)."""
    lay = BlockLayout(24, 4, ((4, 8), (12, 16)), 16, hole_spans=((8, 12),))
    for nbrs in (None, [[1], []], [[1]], [[0], [0]], [[1], [0]],
                 [[0], [1]], [[1], [0], [0]]):
        dense = build_blocked_causal_mask(lay, doc_neighbors=nbrs)
        did, bits, sul = layout_to_metadata(lay, doc_neighbors=nbrs)
        meta = mask_from_metadata(did, bits, sul)
        np.testing.assert_array_equal(
            dense, meta[:24, :24], err_msg=f"nbrs={nbrs}")
