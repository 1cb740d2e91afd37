"""Generation engine: SDAG prefill + causal KV-cache decode.

Replaces the reference's per-token Python decode loop
(``SDAG.py:130-213``) and HF ``model.generate`` batch path
(``content_generation.py:44-94``) with one jitted function per shape bucket:
a single block-sparse prefill, then a ``jax.lax.while_loop`` decode with EOS
early-exit, batched across queries (the reference runs ISO generation one
query at a time, ``main.py:469-496``).

Reference quirk fixed deliberately (SURVEY.md §7): the reference emits up to
``max_new_tokens + 1`` tokens (``SDAG.py:181-191``); this engine emits at
most ``max_new_tokens``.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdag_tpu.models.llama import (DecoderConfig, decode_step, decode_window,
                                   prefill)
from sdag_tpu.ops.sampling import (draft_accept_probs, sample_excluding,
                                   sample_tokens)
from sdag_tpu.sdag.spans import PromptPlan


from sdag_tpu.utils.mathutil import round_up as _round_up


class Generator:
    """Batched text generation with optional document isolation."""

    def __init__(self, params, cfg: DecoderConfig, tokenizer,
                 temperature: float = 0.0, top_p: float = 1.0,
                 attn_impl: str = "auto", seed: int = 0,
                 pad_multiple: int = 128,
                 block_align: Optional[int] = None,
                 kv_cache_dtype: str = "native",
                 speculative_draft: int = 0,
                 tp_mesh=None, tp_axis: str = "model",
                 batch_bucket: int = 0) -> None:
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        # sample_tokens treats temperature <= 0 as greedy; clamp here so
        # the speculative engine's `temperature == 0` branches agree
        self.temperature = max(float(temperature), 0.0)
        self.top_p = float(top_p)
        self.attn_impl = attn_impl
        # 'int8' halves decode KV HBM traffic (per-slot scales; opt-in,
        # ~8-bit quantization error on cached keys/values)
        self.kv_cache_dtype = kv_cache_dtype
        # Prompt-lookup speculative decoding: per round, draft
        # `speculative_draft` tokens by continuing the last bigram's most
        # recent occurrence in the prompt, verify them in ONE KV-bound
        # forward.  RAG answers quote retrieved passages, so drafts hit
        # often.  Greedy (T=0) emits exactly the greedy continuation;
        # T>0 uses exact speculative sampling (accept draft d with
        # probability p(d), residual draw on rejection) so the output
        # DISTRIBUTION equals the non-speculative sampler's.
        # Composes with KV_CACHE_DTYPE='int8': the verification window
        # quantizes its K/V writes per slot and dequantizes via scales,
        # so speculation keeps the int8 cache's halved KV traffic.
        self.speculative_draft = int(speculative_draft)
        # Tensor-parallel generation (serving models that don't fit one
        # chip, e.g. Llama-3.1-8B bf16 on v5e): the whole generate fn runs
        # inside a shard_map over `tp_axis` with Megatron-sharded weights
        # (parallel/sharding.py) — attention/MLP on local head/ff slices,
        # psum on the two row-sharded projections, vocab-sharded lm_head
        # all-gathered before sampling.  KV cache holds the local kv-head
        # slice, so cache memory also divides by the axis size.
        self.tp_mesh = tp_mesh
        self.tp_axis = tp_axis if tp_mesh is not None else None
        # batch (data-parallel) sharding composes with TP when the mesh
        # has a >1 'data' axis: rows split across data groups, each group
        # runs TP over its model slice.  Sampling keys are fold_in'ed
        # with the data index so shards draw independent randomness.
        self.dp_axis = ("data" if tp_mesh is not None
                        and "data" in tp_mesh.shape
                        and tp_mesh.shape["data"] > 1 else None)
        if tp_mesh is not None:
            n = tp_mesh.shape[tp_axis]
            # tied embeddings are replicated, so vocab needn't divide
            vocab_ok = cfg.tie_embeddings or cfg.vocab_size % n == 0
            if (cfg.n_heads % n or cfg.n_kv_heads % n or cfg.d_ff % n
                    or not vocab_ok):
                raise ValueError(
                    f"tensor-parallel axis size {n} must divide n_heads="
                    f"{cfg.n_heads}, n_kv_heads={cfg.n_kv_heads}, d_ff="
                    f"{cfg.d_ff} (and vocab_size={cfg.vocab_size} when "
                    "lm_head is untied)")
            from sdag_tpu.parallel.sharding import shard_params
            self.params = shard_params(params, cfg, tp_mesh)
        on_tpu = jax.default_backend() == "tpu"
        # TPU: 512-wide kernel tiles win on grid/DMA overhead.  Block-aligned
        # doc packing (block_align>0) is opt-in: for passage-sized docs the
        # ~30% hole inflation outweighs the extra tile skipping (it pays off
        # when docs are >= the tile size).
        self.pad_multiple = 512 if on_tpu else pad_multiple
        # partial batches pad up to this row count (0 = off) so they hit
        # the full batch's compiled fn; pad rows are inert (valid_len 0)
        self.batch_bucket = int(batch_bucket)
        self.block_align = block_align if block_align is not None else 0
        self._key = jax.random.PRNGKey(seed)
        self._compiled: Dict[Tuple[int, int, int], object] = {}
        # speculative observability: verification rounds of the last call
        # (acceptance comes from the cumulative per-row counters below —
        # tokens/row_rounds - 1 — which, unlike a rounds*batch estimate,
        # is unbiased under skewed answer lengths)
        self.last_spec_rounds = 0
        # cumulative across calls (experiment-level acceptance reporting:
        # tokens / row_rounds - 1 = measured accepted drafts per round)
        self.spec_total_rounds = 0
        self.spec_total_row_rounds = 0
        self.spec_total_tokens = 0

    def _pad_len(self, max_len: int) -> int:
        """Length bucket: pad_multiple granularity up to 4k, then 2048 —
        long-prompt batches whose raw lengths wobble batch to batch land
        on one compiled shape instead of recompiling per batch (each
        extra shape is a full remote compile on the tunnel)."""
        lp = _round_up(max_len, self.pad_multiple)
        if lp > 4096:
            lp = _round_up(lp, 2048)
        return lp

    # ------------------------------------------------------------ public
    def generate_plans(self, plans: Sequence[PromptPlan],
                       doc_neighbors: Optional[Sequence] = None,
                       max_new_tokens: int = 128) -> List[str]:
        """ISO path: generate with document-isolation prefill."""
        ids = [p.input_ids for p in plans]
        metas = []
        lp = self._pad_len(max(len(x) for x in ids))
        for i, p in enumerate(plans):
            nbrs = doc_neighbors[i] if doc_neighbors is not None else None
            metas.append(p.metadata(doc_neighbors=nbrs, pad_to=lp))
        doc_id = np.stack([m[0] for m in metas])
        nbr_bits = np.stack([m[1] for m in metas])
        sys_user_len = np.asarray([m[2] for m in metas], np.int32)
        return self._run(ids, doc_id, nbr_bits, sys_user_len, lp,
                         max_new_tokens, mask_tiles=True)

    def generate_ids(self, ids: Sequence[np.ndarray],
                     max_new_tokens: int = 128) -> List[str]:
        """NO-ISO path: plain causal generation."""
        lp = self._pad_len(max(len(x) for x in ids))
        b = len(ids)
        doc_id = np.full((b, lp), -1, np.int32)
        nbr_bits = np.zeros((b, lp), np.int32)
        sys_user_len = np.zeros((b,), np.int32)
        return self._run(ids, doc_id, nbr_bits, sys_user_len, lp,
                         max_new_tokens, mask_tiles=False)

    # ----------------------------------------------------------- internal
    def _run(self, ids: Sequence[np.ndarray], doc_id, nbr_bits, sys_user_len,
             lp: int, max_new_tokens: int,
             mask_tiles: bool = False) -> List[str]:
        b = len(ids)
        # batch-dim padding: (a) under data parallelism the batch must
        # divide the 'data' axis; (b) with batch_bucket set (the pipeline
        # passes LLM_BATCH_SIZE), partial batches pad up to the bucket so
        # the trailing batch reuses the full-batch compiled fn instead of
        # triggering a fresh (slow, tunnel-bound) compile.  Pad rows have
        # valid_len == 0 and are born done in the decode loop.
        dp_n = self.tp_mesh.shape["data"] if self.dp_axis else 1
        bp = _round_up(b, dp_n)
        if self.batch_bucket and bp < self.batch_bucket:
            bp = _round_up(self.batch_bucket, dp_n)
        batch_ids = np.full((bp, lp), self.tokenizer.pad_token_id, np.int32)
        valid_len = np.zeros((bp,), np.int32)
        for i, x in enumerate(ids):
            batch_ids[i, :len(x)] = x
            valid_len[i] = len(x)
        if bp != b:
            doc_id = np.concatenate(
                [doc_id, np.full((bp - b, lp), -1, np.int32)])
            nbr_bits = np.concatenate(
                [nbr_bits, np.zeros((bp - b, lp), np.int32)])
            sys_user_len = np.concatenate(
                [sys_user_len, np.zeros((bp - b,), np.int32)])

        fn = self._get_compiled(bp, lp, max_new_tokens, mask_tiles)
        self._key, sub = jax.random.split(self._key)
        res = fn(self.params, jnp.asarray(batch_ids),
                 jnp.asarray(doc_id), jnp.asarray(nbr_bits),
                 jnp.asarray(sys_user_len), jnp.asarray(valid_len),
                 sub)
        if len(res) == 4:   # speculative engine also reports its rounds
            out, lengths, rounds, row_rounds = res
            # emitted/row_rounds - 1 = mean accepted drafts per round:
            # the workload's actual speculation factor (row_rounds only
            # counts rounds a row was still active for, so EOS-early
            # rows don't dilute the measurement)
            self.last_spec_rounds = int(rounds)
            self.spec_total_rounds += int(rounds)
            self.spec_total_row_rounds += int(row_rounds)
            self.spec_total_tokens += int(np.asarray(res[1]).sum())
        else:
            out, lengths = res
        out = np.asarray(out)
        lengths = np.asarray(lengths)
        texts = []
        for i in range(b):
            toks = out[i, :lengths[i]]
            texts.append(self.tokenizer.decode(
                toks, skip_special_tokens=True).strip())
        return texts

    def _get_compiled(self, b: int, lp: int, max_new: int,
                      mask_tiles: bool = False):
        key = (b, lp, max_new, mask_tiles)
        if key not in self._compiled:
            self._compiled[key] = self._build(lp, max_new, mask_tiles)
        return self._compiled[key]

    def _wrap(self, run):
        """jit the generate fn; under tensor parallelism, shard_map it
        over the mesh first (weights per Megatron specs, batch rows over
        the 'data' axis when present, everything else replicated — the
        psums inside make logits replicated within a data group, so the
        sampled tokens are identical on every device of the group)."""
        if self.tp_mesh is None:
            return jax.jit(run)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from sdag_tpu.parallel.sharding import decoder_param_specs
        pspecs = decoder_param_specs(self.cfg)
        dp = self.dp_axis
        row = P(dp, None) if dp else P()
        vec = P(dp) if dp else P()
        outs = (row, vec) if self.speculative_draft == 0 \
            else (row, vec, P(), P())  # + replicated round counters
        fn = shard_map(run, mesh=self.tp_mesh,
                       in_specs=(pspecs, row, row, row, vec, vec, P()),
                       out_specs=outs, check_vma=False)
        return jax.jit(fn)

    def _dp_key(self, key):
        """Inside the shard_map: decorrelate sampling across data groups."""
        if self.dp_axis is None:
            return key
        return jax.random.fold_in(key, jax.lax.axis_index(self.dp_axis))

    def _build(self, lp: int, max_new: int, mask_tiles: bool = False):
        if self.speculative_draft > 0:
            return self._build_speculative(lp, max_new, mask_tiles)
        cfg = self.cfg
        eos = int(self.tokenizer.eos_token_id)
        pad = int(self.tokenizer.pad_token_id)
        temperature, top_p = self.temperature, self.top_p
        attn_impl = self.attn_impl
        kv_dtype = self.kv_cache_dtype
        cache_size = lp + max_new
        # lp is always a multiple of pad_multiple (512 on TPU, where wide
        # tiles win on grid/DMA overhead; 128 elsewhere), so the kernel
        # block size simply follows it.  block_align only controls doc
        # packing (sdag/spans.py), not kernel tiling.
        block = self.pad_multiple
        tp = self.tp_axis

        def run(params, input_ids, doc_id, nbr_bits, sys_user_len, valid_len,
                key):
            key = self._dp_key(key)
            batch = input_ids.shape[0]
            logits, cache = prefill(
                params, cfg, input_ids, doc_id=doc_id, nbr_bits=nbr_bits,
                sys_user_len=sys_user_len, valid_len=valid_len,
                cache_size=cache_size, attn_impl=attn_impl,
                block_q=block, block_k=block, kv_dtype=kv_dtype,
                tp_axis=tp, logits_last_only=True,
                use_mask_tiles=mask_tiles)
            last = logits[:, 0, :]
            key, sub = jax.random.split(key)
            cur = sample_tokens(sub, last, temperature, top_p)

            slot_iota = jnp.arange(cache_size, dtype=jnp.int32)[None, :]
            # hole tokens (block-aligned packing) are invisible in decode too
            active = jnp.concatenate(
                [doc_id != -2, jnp.ones((batch, max_new), bool)], axis=1)
            base_mask = (slot_iota < valid_len[:, None]) & active
            # RoPE positions of generated tokens continue the *active* token
            # count (holes don't advance positions)
            real_len = jnp.sum(
                ((doc_id != -2) &
                 (slot_iota[:, :lp] < valid_len[:, None])).astype(jnp.int32),
                axis=1)

            out0 = jnp.full((batch, max_new), pad, jnp.int32)
            # rows padded for batch bucketing / data parallelism carry
            # valid_len == 0: born done, so they never hold back the
            # while-loop's EOS early exit
            done0 = valid_len == 0
            len0 = jnp.zeros((batch,), jnp.int32)

            def cond(state):
                t, _, _, _, done, _, _ = state
                return (t < max_new) & jnp.logical_not(jnp.all(done))

            def body(state):
                t, out, cur, cache, done, lengths, key = state
                out = jax.lax.dynamic_update_slice(
                    out, jnp.where(done, pad, cur)[:, None], (0, t))
                lengths = lengths + jnp.where(done, 0, 1)
                done = done | (cur == eos)

                # Unconditional step: a lax.cond here would copy the (large)
                # KV cache through the untaken branch every iteration; the
                # final iteration's extra forward is far cheaper.  Early exit
                # still happens via the while condition.
                mask = base_mask | ((slot_iota >= lp) &
                                    (slot_iota <= lp + t))
                logits, cache = decode_step(
                    params, cfg, cur, real_len + t, cache,
                    write_index=lp + t, cache_mask=mask, tp_axis=tp)
                key, sub = jax.random.split(key)
                nxt = sample_tokens(sub, logits, temperature, top_p)
                cur = jnp.where(done, eos, nxt)
                return t + 1, out, cur, cache, done, lengths, key

            state = (jnp.int32(0), out0, cur, cache, done0, len0, key)
            _, out, _, _, _, lengths, _ = jax.lax.while_loop(cond, body,
                                                             state)
            return out, lengths

        return self._wrap(run)

    def _build_speculative(self, lp: int, max_new: int,
                           mask_tiles: bool = False):
        """Decode with prompt-lookup speculation.

        Each round: (1) draft D tokens by continuing the most recent
        occurrence of the current (prev, cur) bigram — searched over the
        emitted tokens first, then the prompt (full-context
        prompt-lookup), (2) verify
        [cur, drafts] in ONE G=D+1-token forward (KV-bandwidth-bound,
        like a single decode step), (3) accept the longest valid draft
        prefix, plus a bonus token from the model.  Greedy: a draft is
        valid iff it equals the model's argmax — output is exactly the
        greedy continuation.  Sampling (T>0): draft d is accepted with
        probability p(d) under the engine's (temperature, top_p)
        distribution, and the bonus/residual token is drawn from p
        (excluding a rejected draft) — exact speculative sampling, so
        the output distribution equals the non-speculative sampler's.
        Rows advance by their own accepted counts (per-row cache
        offsets); speculation only changes how many forwards it takes.
        """
        cfg = self.cfg
        eos = int(self.tokenizer.eos_token_id)
        pad = int(self.tokenizer.pad_token_id)
        attn_impl = self.attn_impl
        temperature, top_p = self.temperature, self.top_p
        G = self.speculative_draft + 1
        # window writes G slots starting at (lp + emitted) <= lp+max_new-1
        cache_size = lp + max_new + G
        block = self.pad_multiple
        tp = self.tp_axis

        def run(params, input_ids, doc_id, nbr_bits, sys_user_len, valid_len,
                key):
            key = self._dp_key(key)
            batch = input_ids.shape[0]
            logits, cache = prefill(
                params, cfg, input_ids, doc_id=doc_id, nbr_bits=nbr_bits,
                sys_user_len=sys_user_len, valid_len=valid_len,
                cache_size=cache_size, attn_impl=attn_impl,
                block_q=block, block_k=block, tp_axis=tp,
                kv_dtype=self.kv_cache_dtype, logits_last_only=True,
                use_mask_tiles=mask_tiles)
            last = logits[:, 0, :]
            key, sub = jax.random.split(key)
            cur0 = sample_tokens(sub, last, temperature, top_p)
            prev0 = jnp.take_along_axis(
                input_ids, (valid_len - 1)[:, None], axis=1)[:, 0]

            slot_iota = jnp.arange(cache_size, dtype=jnp.int32)[None, :]
            active = jnp.concatenate(
                [doc_id != -2, jnp.ones((batch, max_new + G), bool)], axis=1)
            base_mask = (slot_iota < valid_len[:, None]) & active
            real_len = jnp.sum(
                ((doc_id != -2) &
                 (slot_iota[:, :lp] < valid_len[:, None])).astype(jnp.int32),
                axis=1)

            jpos = jnp.arange(lp - 1, dtype=jnp.int32)
            iota_g = jnp.arange(G, dtype=jnp.int32)
            col = jnp.arange(max_new, dtype=jnp.int32)[None, :]

            out0 = jnp.full((batch, max_new), pad, jnp.int32)
            done0 = valid_len == 0  # bucket-pad rows are born done
            n0 = jnp.zeros((batch,), jnp.int32)

            def cond(state):
                r, _, _, _, _, _, done, _, _ = state
                return (r < max_new) & jnp.logical_not(jnp.all(done))

            def body(state):
                r, out, prev, cur, n, cache, done, key, rr = state
                # per-row active rounds: rows finished early (EOS) stop
                # accruing, so tokens/row_rounds - 1 is the true mean
                # acceptance (charging every row the batch-max round
                # count biased the reported acceptance low on skewed
                # answer lengths)
                rr = rr + jnp.sum(jnp.logical_not(done).astype(jnp.int32))
                # ---- draft: continue the last (prev, cur) bigram match.
                # Full-context lookup: the prompt AND the tokens emitted so
                # far are both draft sources (long generations repeat their
                # own phrasing at least as often as the prompt's); a match
                # in the emitted history is preferred — it is the more
                # recent context.  Drafts never affect outputs, only
                # acceptance: verification pins the result either way.
                m = ((input_ids[:, :-1] == prev[:, None]) &
                     (input_ids[:, 1:] == cur[:, None]) &
                     ((jpos + 1)[None, :] < valid_len[:, None]))
                found = jnp.any(m, axis=1)
                jstar = jnp.max(jnp.where(m, jpos[None, :], -1), axis=1)
                src = jstar[:, None] + 2 + iota_g[None, :G - 1]
                ok = found[:, None] & (src < valid_len[:, None])
                drafts = jnp.take_along_axis(input_ids,
                                             jnp.clip(src, 0, lp - 1), axis=1)
                drafts = jnp.where(ok, drafts, cur[:, None])
                if max_new > 1:
                    opos = jnp.arange(max_new - 1, dtype=jnp.int32)
                    mo = ((out[:, :-1] == prev[:, None]) &
                          (out[:, 1:] == cur[:, None]) &
                          ((opos + 1)[None, :] < n[:, None]))
                    found_o = jnp.any(mo, axis=1)
                    jstar_o = jnp.max(jnp.where(mo, opos[None, :], -1),
                                      axis=1)
                    src_o = jstar_o[:, None] + 2 + iota_g[None, :G - 1]
                    ok_o = found_o[:, None] & (src_o < n[:, None])
                    drafts_o = jnp.take_along_axis(
                        out, jnp.clip(src_o, 0, max_new - 1), axis=1)
                    drafts = jnp.where(found_o[:, None],
                                       jnp.where(ok_o, drafts_o,
                                                 cur[:, None]),
                                       drafts)
                w = jnp.concatenate([cur[:, None], drafts], axis=1)  # [B,G]

                # ---- verify in one G-token forward
                pos = (real_len + n)[:, None] + iota_g[None, :]
                base = lp + n
                hist = base_mask | ((slot_iota >= lp) &
                                    (slot_iota < base[:, None]))
                win = ((slot_iota[:, None, :] >= base[:, None, None]) &
                       (slot_iota[:, None, :] <=
                        base[:, None, None] + iota_g[None, :, None]))
                mask3 = hist[:, None, :] | win
                logits, cache = decode_window(params, cfg, w, pos, cache,
                                              base, mask3, tp_axis=tp)

                # ---- accept longest valid draft prefix (+ EOS/budget)
                if temperature == 0.0:
                    g_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    match = (w[:, 1:] == g_tok[:, :-1]).astype(jnp.int32)
                else:
                    key, ku, ks = jax.random.split(key, 3)
                    p_acc = draft_accept_probs(logits[:, :-1], w[:, 1:],
                                               temperature, top_p)
                    u = jax.random.uniform(ku, p_acc.shape)
                    match = (u < p_acc).astype(jnp.int32)
                a = jnp.sum(jnp.cumprod(match, axis=1), axis=1)
                eos_pos = jnp.min(jnp.where(w == eos, iota_g[None, :], G),
                                  axis=1)
                emit = jnp.minimum(jnp.minimum(1 + a, eos_pos + 1),
                                   max_new - n)
                emit = jnp.where(done, 0, emit)

                rel = col - n[:, None]
                in_row = (rel >= 0) & (rel < emit[:, None])
                vals = jnp.take_along_axis(w, jnp.clip(rel, 0, G - 1),
                                           axis=1)
                out = jnp.where(in_row, vals, out)

                hit_eos = eos_pos < emit
                n = n + emit
                done = done | hit_eos | (n >= max_new)
                last_idx = jnp.maximum(emit - 1, 0)[:, None]
                prev = jnp.where(emit > 0,
                                 jnp.take_along_axis(w, last_idx, 1)[:, 0],
                                 prev)
                if temperature == 0.0:
                    nxt = jnp.take_along_axis(g_tok, last_idx, 1)[:, 0]
                else:
                    # bonus/residual draw from the last verified position;
                    # exclude the rejected draft iff the chain was cut by
                    # a rejection (not by EOS/budget/full acceptance)
                    logits_last = jnp.take_along_axis(
                        logits, last_idx[:, :, None], axis=1)[:, 0, :]
                    cut_by_rej = (emit == 1 + a) & (a < G - 1) & ~done
                    rej = jnp.take_along_axis(
                        w, jnp.clip(emit, 0, G - 1)[:, None], 1)[:, 0]
                    excl = jnp.where(cut_by_rej, rej, -1)
                    nxt = sample_excluding(ks, logits_last, excl,
                                           temperature, top_p)
                cur = jnp.where(done, eos, nxt)
                return r + 1, out, prev, cur, n, cache, done, key, rr

            state = (jnp.int32(0), out0, prev0, cur0, n0, cache, done0, key,
                     jnp.int32(0))
            rounds, out, _, _, lengths, _, _, _, row_rounds = \
                jax.lax.while_loop(cond, body, state)
            # observability: emitted-tokens / row_rounds - 1 = mean
            # accepted drafts per round on THIS workload (the real
            # speculation speedup factor; bench quotes the
            # full-acceptance ceiling).  Under data parallelism groups
            # stop at different rounds: pmax replicates the wall-clock
            # round count, psum makes row_rounds the global row total.
            if self.dp_axis is not None:
                rounds = jax.lax.pmax(rounds, self.dp_axis)
                row_rounds = jax.lax.psum(row_rounds, self.dp_axis)
            return out, lengths, rounds, row_rounds

        return self._wrap(run)
