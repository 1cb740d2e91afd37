"""One-shot real-TPU smoke for every kernel touched since the last on-chip
run: fused top-k (f32 + int8, incl. the k > valid_n -1 contract), the BM25
scan kernel, the splash prefill kernel (Mosaic-legal doc-id load), and the
production kvres prefill dispatch at the bench geometry.

Interpret mode cannot catch Mosaic tiling constraints (CLAUDE.md), so this
is the required hardware check after kernel edits.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/onchip_smoke.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def check_topk():
    from sdag_tpu.ops.topk import (exact_topk_xla, fused_topk_matmul,
                                   fused_topk_matmul_int8,
                                   quantize_rows_int8)
    rng = np.random.default_rng(14)
    qe = rng.standard_normal((8, 128)).astype(np.float32)
    ce = rng.standard_normal((2048, 128)).astype(np.float32)
    v_ref, i_ref = exact_topk_xla(jnp.asarray(qe), jnp.asarray(ce), 10)
    v, i = fused_topk_matmul(jnp.asarray(qe), jnp.asarray(ce), 10,
                             block_n=1024)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), rtol=2e-5,
                               atol=2e-5)
    # k > valid_n: -1 contract on hardware
    v, i = fused_topk_matmul(jnp.asarray(qe), jnp.asarray(ce), 10,
                             block_n=1024, valid_n=4)
    assert np.array_equal(np.asarray(i)[:, 4:],
                          np.full((8, 6), -1)), np.asarray(i)
    ci8, sc = quantize_rows_int8(ce)
    v8, i8 = fused_topk_matmul_int8(jnp.asarray(qe), jnp.asarray(ci8),
                                    jnp.asarray(sc), 10, block_n=1024,
                                    valid_n=4)
    assert np.array_equal(np.asarray(i8)[:, 4:], np.full((8, 6), -1))
    print("topk OK")


def check_bm25():
    from sdag_tpu.ops.bm25 import bm25_topk, bm25_topk_dispatch
    rng = np.random.default_rng(3)
    n, lp, v = 1024, 16, 500
    term_ids = rng.integers(0, v, size=(n, lp)).astype(np.int32)
    impacts = (rng.random((n, lp)) + 0.1).astype(np.float32)
    q_terms = term_ids[:4, :6].copy()
    q_weights = np.ones_like(q_terms, np.float32)
    args = (jnp.asarray(term_ids), jnp.asarray(impacts),
            jnp.asarray(q_terms), jnp.asarray(q_weights))
    v_p, i_p = bm25_topk(*args, k=10)
    v_x, i_x = bm25_topk_dispatch(*args, 10, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_x))
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x), rtol=1e-5,
                               atol=1e-5)
    v_p, i_p = bm25_topk(*args, k=10, valid_n=2)
    assert np.array_equal(np.asarray(i_p)[:, 2:], np.full((4, 8), -1))
    print("bm25 OK")


def _bench_layout(L=4096, n_docs=20, doc_len=176, sys_len=256):
    doc_id = np.full(L, -1, np.int32)
    nbr_bits = np.zeros(L, np.int32)
    for d in range(n_docs):
        s = sys_len + d * doc_len
        doc_id[s:s + doc_len] = d
        bits = 0
        for n in (d - 1, d + 1):
            if 0 <= n < n_docs:
                bits |= 1 << n
        nbr_bits[s:s + doc_len] = bits
    return jnp.asarray(doc_id)[None], jnp.asarray(nbr_bits)[None], sys_len


def check_prefill_and_splash():
    from sdag_tpu.ops.attention import (sdag_prefill_attention,
                                        sdag_splash_attention)
    B, H, KV, Dh, L = 1, 16, 8, 128, 4096
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, H, L, Dh), jnp.bfloat16)
    k = jax.random.normal(kk, (B, KV, L, Dh), jnp.bfloat16)
    v = jax.random.normal(kv, (B, KV, L, Dh), jnp.bfloat16)
    doc_id, nbr_bits, sys_len = _bench_layout(L)

    t0 = time.time()
    out_kvres = np.asarray(sdag_prefill_attention(
        q, k, v, doc_id, nbr_bits, sys_len, block_q=512, block_k=512,
        use_mask_tiles=True))
    print(f"kvres prefill ran in {time.time() - t0:.1f}s")
    t0 = time.time()
    out_s = np.asarray(sdag_splash_attention(
        q, k, v, doc_id, nbr_bits, sys_len, block_q=256, block_k=256))
    print(f"splash compiled+ran in {time.time() - t0:.1f}s")
    err = np.abs(out_s.astype(np.float32)
                 - out_kvres.astype(np.float32)).max()
    print("max |splash - kvres| =", err)
    assert err < 3e-2, err
    print("prefill/splash OK")


def main():
    print("backend:", jax.default_backend())
    x = jnp.ones((256, 256))
    print("warm matmul:", float((x @ x)[0, 0]))
    check_topk()
    check_bm25()
    check_prefill_and_splash()
    print("ALL ONCHIP CHECKS OK")


if __name__ == "__main__":
    main()
