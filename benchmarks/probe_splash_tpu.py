"""Real-TPU probe for the splash kernel (sdag_splash_attention).

The splash kernel's doc-id load was rewritten to the Mosaic-legal
pre-tiled form ([B, nK, block_k] -> dynamic sublane index at lane
offset 0); interpret mode cannot catch that constraint (CLAUDE.md), so
this probe compiles + runs the kernel once on the real chip at the
bench geometry (L=4096, 20 docs) and checks parity against the
production kvres dispatch.

Run: python benchmarks/probe_splash_tpu.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from sdag_tpu.ops.attention import (sdag_prefill_attention,
                                    sdag_splash_attention)


def main():
    print("backend:", jax.default_backend())
    B, H, KV, Dh, L = 1, 16, 8, 128, 4096
    n_docs, doc_len, sys_len = 20, 176, 256
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, L, Dh), jnp.bfloat16)
    k = jax.random.normal(kk, (B, KV, L, Dh), jnp.bfloat16)
    v = jax.random.normal(kv, (B, KV, L, Dh), jnp.bfloat16)

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
    doc_id = jnp.asarray(doc_id)[None]
    nbr_bits = jnp.asarray(nbr_bits)[None]

    t0 = time.time()
    out_s = np.asarray(sdag_splash_attention(
        q, k, v, doc_id, nbr_bits, sys_len, block_q=256, block_k=256))
    print(f"splash compiled+ran in {time.time() - t0:.1f}s")
    out_ref = np.asarray(sdag_prefill_attention(
        q, k, v, doc_id, nbr_bits, sys_len, block_q=512, block_k=512,
        use_mask_tiles=True))
    err = np.abs(out_s.astype(np.float32) - out_ref.astype(np.float32)).max()
    print("max |splash - kvres| =", err)
    assert err < 3e-2, err

    # crude wall timing (relay RTT-dominated; just sanity, not a headline)
    for _ in range(2):
        t0 = time.time()
        np.asarray(sdag_splash_attention(q, k, v, doc_id, nbr_bits, sys_len,
                                         block_q=256, block_k=256))
        print(f"splash call (incl. fetch): {(time.time() - t0) * 1e3:.1f} ms")
    print("OK")


if __name__ == "__main__":
    main()
