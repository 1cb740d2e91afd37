"""Train a tiny decoder on synthetic answer-from-context QA.

Purpose: demonstrate the reference paper's effect — document isolation
(ISO) suppressing the poisoning attack success rate vs causal attention
(NO-ISO) — which needs a model whose ACC is meaningfully above zero.  Real
pretrained checkpoints don't exist offline, so this trains one from scratch
on the synthetic world of utils/synth_qa.py, using the repo's own sharded
train step (parallel/train.py) and prompt planner (sdag/spans.py), then
saves a native checkpoint the pipeline loads via ``LLM_CHECKPOINT``
(models/native_ckpt.py).

Faithfulness notes:
  * Training prompts are built by the SAME code path the pipeline serves
    with (``build_rag_prompt_plan`` + the reference-identical
    ``USER_RAG_PROMPT`` template), so there is no train/serve skew.
  * Examples mix ISO-masked and causal prefills 50/50: the experiment
    compares the two modes on one model, so both must be in-distribution
    (a pretrained LLM is likewise competent at both).
  * Training data is CLEAN — no poisoned documents are ever shown, so the
    attack evaluation measures an unseen attack, like the reference's.
  * ~25% of entities are held out entirely; eval on them proves the model
    answers by READING the context, not by memorizing facts.

CLI::

    python -m sdag_tpu.pipeline.train_qa --out ckpt_dir [--steps 3000] ...
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdag_tpu.core.mesh import make_mesh
from sdag_tpu.models.llama import (DecoderConfig, init_decoder_params,
                                   prefill)
from sdag_tpu.models.native_ckpt import save_decoder
from sdag_tpu.models.tokenizer import ByteTokenizer
from sdag_tpu.parallel.train import (make_sharded_train_scan,
                                     make_sharded_train_step)
from sdag_tpu.sdag.spans import build_rag_prompt_plan
from sdag_tpu.utils.synth_qa import (Fact, World, fact_doc, fact_query,
                                     make_world, random_fact, save_world,
                                     styled_fact_doc)


AUX_LM_WEIGHT = 0.1


def build_example(rng: np.random.Generator, tokenizer, fact: Fact,
                  pool: Optional[List[Fact]], k: int, iso: bool,
                  seq_len: int, styled_frac: float = 0.3,
                  dup_frac: float = 0.25,
                  nbr_frac: float = 0.0,
                  answer_form: str = "value",
                  ) -> Optional[Dict[str, np.ndarray]]:
    """One training example: k-doc RAG prompt (GT doc at a random rank,
    distractors drawn from other facts) + the answer.  Loss weights: 1.0
    on the answer tokens, AUX_LM_WEIGHT on the whole prompt — the
    auxiliary language-modeling signal is what grows induction/copy heads
    in small transformers (answer-only supervision left held-out accuracy
    flat at the pseudoword-LM entropy).  iso=True applies the SDAG doc
    metadata at prefill; iso=False is the plain causal (NO-ISO) prefill.
    pool=None draws FRESH random distractor facts (stream mode — see
    random_fact).

    Surface/shape robustness (all CLEAN — every doc asserts a true value):
    each doc renders as the plain template or, with prob ~0.3, as a
    styled_fact_doc (the poison generator's query-echo + authority-tail
    surface form, true value); and with prob ~0.25 the GT fact is
    REPEATED 2..k times in mixed styles.  Without these, an eval context
    of k near-identical poison-template docs (n_mal=k) is off-
    distribution and the model degenerates into garbage instead of
    copying the asserted value (sdag_effect r3, n_mal=5 rows).

    Ablation caveat (measured, experiments/results/sdag_effect):
    dup_frac>0 teaches the model that cross-doc repetition is normal
    evidence, which AMPLIFIES repeated-claim poisoning in both modes and
    narrows the ISO-vs-NOISO ASR gap; styled_frac alone fixes the
    template shock without that side effect.

    nbr_frac>0 renders that fraction of ISO examples with RANDOM
    neighbor windows (each doc attends 1..4 random other docs —
    the mask family DOC_NEIGHBORS_K serving produces via doc-KNN,
    reference ``SDAG.py:356-359``).  A model trained only on the
    {strict-ISO, causal} endpoints collapses on intermediate masks:
    the r4 k-sweep on the nbr_frac=0 checkpoint measured clean ACC
    0.917 -> 0.177 (k=2) -> 0.010 (k=4) with ASR falling too — pure
    out-of-distribution garbage, not an isolation trade."""
    def render(f: Fact) -> str:
        if rng.random() < styled_frac:
            return styled_fact_doc(f, int(rng.integers(0, 5)))
        return fact_doc(f)

    n_gt = 1
    if k >= 2 and rng.random() < dup_frac:
        n_gt = int(rng.integers(2, k + 1))
    if pool is None:
        docs = [render(random_fact(rng)) for _ in range(k - n_gt)]
    else:
        others = [f for f in pool if f is not fact]
        picks = rng.choice(len(others), size=min(k - n_gt, len(others)),
                           replace=False)
        docs = [render(others[int(i)]) for i in picks]
    for _ in range(n_gt):
        docs.insert(int(rng.integers(0, len(docs) + 1)), render(fact))
    plan = build_rag_prompt_plan(tokenizer, fact_query(fact), docs)
    # Target the MID-SENTENCE surface form (" value"), because that is the
    # form present in the retrieved doc ("... is value.").  Under the word
    # tokenizer the two surfaces are DIFFERENT ids; targeting the bare form
    # makes a single-token induction copy impossible (the r4 30M word run
    # pinned tok_acc at exactly 0.5: EOS right, value never — the copyable
    # token simply wasn't the target).  EM normalization squeezes
    # whitespace, so the leading space is invisible at evaluation.
    #
    # answer_form="sentence" targets the retrieved doc's full sentence
    # ("the {attr} of {entity} is {value}.") instead.  Rationale (the r4/r5
    # 30M diagnosis): under the word tokenizer the bare-value target gives
    # ONE copy-supervised token per example, and at that position the
    # generated prefix ("- Answer:") shares nothing with the source doc —
    # the induction match is weak, and the phase transition took >18k steps
    # to only reach full_acc≈0.3-0.44.  The sentence target supervises ~8
    # tokens, and by the time the value is emitted the prefix "the attr of
    # entity is" matches the doc verbatim — the same strong-prefix copy
    # mechanism that let the 2.76M byte model cross by 6k steps (byte
    # answers re-build the match char by char for free).  Evaluation is
    # unchanged: EM is substring-of-normalized (reference
    # normalization.py:58-64), so a sentence containing the value matches.
    if answer_form == "sentence":
        ans_text = " " + fact_doc(fact)
    else:
        ans_text = " " + fact.value
    ans = (tokenizer.encode(ans_text, add_special_tokens=False)
           + [tokenizer.eos_token_id])
    ids = list(plan.input_ids) + ans
    if len(ids) > seq_len:
        return None
    neighbors = None
    n_docs = len(docs)
    if iso and n_docs > 1 and rng.random() < nbr_frac:
        nbr_k = int(rng.integers(1, 5))
        neighbors = [rng.choice([j for j in range(n_docs) if j != i],
                                size=min(nbr_k, n_docs - 1),
                                replace=False).tolist()
                     for i in range(n_docs)]
    doc_id, nbr_bits, sys_len = plan.metadata(doc_neighbors=neighbors,
                                              pad_to=seq_len)
    if not iso:
        doc_id = np.full_like(doc_id, -1)
        sys_len = 0
    prompt_len = len(plan.input_ids)
    input_ids = np.full(seq_len, tokenizer.pad_token_id, np.int32)
    input_ids[:len(ids)] = ids
    targets = np.zeros(seq_len, np.int32)
    targets[:len(ids) - 1] = ids[1:]
    loss_mask = np.zeros(seq_len, np.float32)
    loss_mask[:len(ids) - 1] = AUX_LM_WEIGHT       # aux LM on the prompt
    loss_mask[prompt_len - 1:len(ids) - 1] = 1.0   # predicts the answer
    return {"input_ids": input_ids, "targets": targets, "doc_id": doc_id,
            "nbr_bits": nbr_bits,
            "sys_user_len": np.int32(sys_len),
            "valid_len": np.int32(len(ids)), "loss_mask": loss_mask}


def _collect_examples(n: int, make_one) -> List[Dict[str, np.ndarray]]:
    """Rejection-sample n examples (build_example returns None when the
    prompt does not fit seq_len).  Single retry loop shared by the train
    samplers and the eval builder — the three copies had already begun
    to drift."""
    exs: List[Dict[str, np.ndarray]] = []
    while len(exs) < n:
        ex = make_one()
        if ex is not None:
            exs.append(ex)
    return exs


def _train_example(rng: np.random.Generator, tokenizer,
                   pool: Optional[List[Fact]], seq_len: int, k_min: int,
                   k_max: int, iso_frac: float, styled_frac: float,
                   dup_frac: float, nbr_frac: float = 0.0,
                   answer_form: str = "value"):
    """One training example: fresh pseudoword fact in stream mode
    (pool=None), random doc count, coin-flipped ISO/causal prefill."""
    fact = random_fact(rng) if pool is None \
        else pool[int(rng.integers(len(pool)))]
    k = int(rng.integers(k_min, k_max + 1))
    return build_example(rng, tokenizer, fact, pool, k,
                         iso=bool(rng.random() < iso_frac),
                         seq_len=seq_len, styled_frac=styled_frac,
                         dup_frac=dup_frac, nbr_frac=nbr_frac,
                         answer_form=answer_form)


def sample_batch(rng: np.random.Generator, tokenizer,
                 pool: Optional[List[Fact]], batch: int, seq_len: int,
                 k_min: int = 2, k_max: int = 10,
                 iso_frac: float = 0.5, styled_frac: float = 0.3,
                 dup_frac: float = 0.25,
                 nbr_frac: float = 0.0,
                 answer_form: str = "value") -> Dict[str, jnp.ndarray]:
    """pool=None = stream mode: every example's facts are fresh
    pseudowords, so the model can only learn answer-from-context."""
    exs = _collect_examples(batch, lambda: _train_example(
        rng, tokenizer, pool, seq_len, k_min, k_max, iso_frac,
        styled_frac, dup_frac, nbr_frac, answer_form))
    return {key: jnp.asarray(np.stack([e[key] for e in exs]))
            for key in exs[0]}


# Wire compression for the remote-relay link: ids fit in int16 (byte vocab),
# doc_id in int8 (<=31 docs), loss_mask in f16 (fractional aux weights) —
# ~4x fewer bytes per uploaded batch.  Decompressed on device inside the
# scan body.  nbr_bits is a BITMASK over doc ids (bit d set when the token
# may attend doc d in full) — int8 silently truncated it past 7 docs, so
# it rides as int32.
_WIRE_DTYPES = {"input_ids": np.int16, "targets": np.int16,
                "doc_id": np.int8, "nbr_bits": np.int32,
                "sys_user_len": np.int32, "valid_len": np.int32,
                "loss_mask": np.float16}


def compress_batch_np(exs: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([e[k] for e in exs]).astype(dt)
            for k, dt in _WIRE_DTYPES.items()}


def decompress_batch(batch):
    out = {k: batch[k].astype(jnp.int32) for k in
           ("input_ids", "targets", "doc_id", "nbr_bits",
            "sys_user_len", "valid_len")}
    out["loss_mask"] = batch["loss_mask"].astype(jnp.float32)
    return out


def sample_batch_stack(rng: np.random.Generator, tokenizer,
                       pool: Optional[List[Fact]], chunk: int, batch: int,
                       seq_len: int, k_min: int = 2, k_max: int = 10,
                       iso_frac: float = 0.5, styled_frac: float = 0.3,
                       dup_frac: float = 0.25,
                       nbr_frac: float = 0.0,
                       answer_form: str = "value") -> Dict[str, np.ndarray]:
    """[S, B, ...] stack of S compressed batches for the scan driver."""
    stacks = []
    for _ in range(chunk):
        exs = _collect_examples(batch, lambda: _train_example(
            rng, tokenizer, pool, seq_len, k_min, k_max, iso_frac,
            styled_frac, dup_frac, nbr_frac, answer_form))
        stacks.append(compress_batch_np(exs))
    return {k: np.stack([s[k] for s in stacks]) for k in stacks[0]}


def teacher_forced_eval(params, cfg: DecoderConfig, tokenizer,
                        eval_pool: List[Fact], distract_pool: List[Fact],
                        seq_len: int, n: int = 32, k: int = 5,
                        seed: int = 123,
                        answer_form: str = "value") -> Dict[str, float]:
    """Answer-token argmax accuracy on held-out entities, per mode.
    full = all answer tokens of an example correct (proxy for gen ACC)."""
    rng = np.random.default_rng(seed)
    out = {}
    fwd = jax.jit(lambda p, b: prefill(
        p, cfg, b["input_ids"], doc_id=b["doc_id"], nbr_bits=b["nbr_bits"],
        sys_user_len=b["sys_user_len"], valid_len=b["valid_len"],
        attn_impl="xla", with_cache=False)[0])
    for mode, iso, nf in (("iso", True, 0.0), ("noiso", False, 0.0),
                          ("iso_nbr", True, 1.0)):
        def one():
            fact = eval_pool[int(rng.integers(len(eval_pool)))]
            return build_example(rng, tokenizer, fact,
                                 distract_pool + [fact], k, iso=iso,
                                 seq_len=seq_len, nbr_frac=nf,
                                 answer_form=answer_form)

        exs = _collect_examples(n, one)
        batch = {key: jnp.asarray(np.stack([e[key] for e in exs]))
                 for key in exs[0]}
        logits = np.asarray(fwd(params, batch))
        pred = logits.argmax(-1)
        # answer tokens only (weight exactly 1.0; aux-LM prompt weights
        # are fractional)
        m = np.asarray(batch["loss_mask"]) == 1.0
        tgt = np.asarray(batch["targets"])
        tok_acc = float((pred[m] == tgt[m]).mean())
        full = float(np.mean([
            (pred[i][m[i]] == tgt[i][m[i]]).all() for i in range(n)]))
        out[f"tok_acc_{mode}"] = round(tok_acc, 4)
        out[f"full_acc_{mode}"] = round(full, 4)
    return out


def main(argv: Optional[List[str]] = None) -> None:
    from sdag_tpu.utils.platform import maybe_force_platform
    maybe_force_platform()
    if os.environ.get("SDAG_FORCE_PLATFORM", "") != "cpu":
        from sdag_tpu.utils.chipjobs import register_chip_job
        register_chip_job("train_qa")
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--entities", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--d-model", type=int, default=192)
    p.add_argument("--layers", type=int, default=6)
    p.add_argument("--heads", type=int, default=6)
    p.add_argument("--kv-heads", type=int, default=6)
    p.add_argument("--d-ff", type=int, default=512)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--warmup", type=int, default=300)
    p.add_argument("--k-min", type=int, default=1)
    p.add_argument("--seq-len", type=int, default=768)
    p.add_argument("--k-max", type=int, default=10)
    p.add_argument("--eval-every", type=int, default=250)
    p.add_argument("--styled-frac", type=float, default=0.3,
                   help="fraction of docs rendered in the poison surface "
                        "template with the TRUE value")
    p.add_argument("--dup-frac", type=float, default=0.25,
                   help="fraction of contexts repeating the GT fact 2..k "
                        "times (0 preserves the ISO-gap — see "
                        "build_example ablation caveat)")
    p.add_argument("--nbr-frac", type=float, default=0.25,
                   help="fraction of ISO examples rendered with random "
                        "neighbor windows (1..4 random docs each) so "
                        "DOC_NEIGHBORS_K serving masks are in-"
                        "distribution; 0 reproduces the r3 recipe")
    p.add_argument("--mesh-data", type=int, default=0)
    p.add_argument("--scan-chunk", type=int, default=25,
                   help="steps per jitted lax.scan call (amortizes "
                        "dispatch RTT on remote-relay links); 1 = plain "
                        "per-step dispatch")
    p.add_argument("--save-every", type=int, default=0,
                   help="also checkpoint every N steps (resumable)")
    p.add_argument("--init-from", default="",
                   help="warm-start params from a native checkpoint dir "
                        "(same arch + tokenizer); optimizer state restarts "
                        "fresh — used to extend a run whose induction "
                        "phase transition began late (the 31M word model "
                        "crossed at ~step 4000 of 6000)")
    p.add_argument("--answer-form", choices=["value", "sentence"],
                   default="value",
                   help="answer target: bare ' value' (r3/r4 recipe) or "
                        "the retrieved doc's full sentence — ~8 copy-"
                        "supervised tokens with a verbatim induction "
                        "prefix at the value position (fixes the word-"
                        "tokenizer transition stall; EM is substring-"
                        "based so evaluation is unchanged)")
    p.add_argument("--eval-n", type=int, default=32,
                   help="held-out eval examples per mode (32 has ±0.09 "
                        "binomial noise on full_acc — use >=128 when the "
                        "eval steers decisions)")
    p.add_argument("--tokenizer", choices=["byte", "word"], default="byte",
                   help="word = closed-vocab WordTokenizer over the synth "
                        "world (~3-4x shorter sequences; pair with a "
                        "smaller --seq-len); saved with the checkpoint "
                        "and auto-loaded at serve time")
    args = p.parse_args(argv)

    world = make_world(args.entities, seed=args.seed)
    if args.tokenizer == "word":
        from sdag_tpu.models.tokenizer import WordTokenizer
        from sdag_tpu.utils.synth_qa import synth_word_vocab
        tokenizer = WordTokenizer(synth_word_vocab())
    else:
        tokenizer = ByteTokenizer()
    cfg = DecoderConfig(vocab_size=tokenizer.vocab_size,
                        d_model=args.d_model, n_layers=args.layers,
                        n_heads=args.heads, n_kv_heads=args.kv_heads,
                        d_ff=args.d_ff)
    # STREAM training (pool=None): every batch's facts are fresh
    # pseudowords — memorization cannot reduce the loss, only copying the
    # value from the matching retrieved doc can.  The fixed world exists
    # solely for evaluation + the downstream poisoning experiment.
    train_pool = None
    eval_pool = world.facts_for(world.eval_entities)
    eval_distract = world.facts_for(world.train_entities)
    print(f"[train_qa] world: {len(world.facts)} facts, "
          f"{len(world.train_entities)} train / "
          f"{len(world.eval_entities)} eval entities", flush=True)

    mesh = make_mesh(data=args.mesh_data, model=1)
    chunk = max(1, args.scan_chunk)
    if chunk > 1 and args.steps % chunk:
        # a partial tail stack has a different [S, ...] shape and forces a
        # SECOND full remote compile of the train scan (minutes under
        # relay contention) — round up instead; extra steps only train
        rounded = ((args.steps + chunk - 1) // chunk) * chunk
        print(f"[train_qa] Note: steps {args.steps} -> {rounded} "
              f"(multiple of --scan-chunk {chunk}; avoids recompiling "
              "the scan for a partial tail)", flush=True)
        args.steps = rounded
    import optax
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, args.warmup, args.steps, args.lr * 0.03)
    opt = optax.adamw(sched, weight_decay=0.01)
    if chunk > 1:
        init_state, scan_fn = make_sharded_train_scan(
            cfg, mesh, optimizer=opt, preprocess=decompress_batch)
    else:
        init_state, step_fn = make_sharded_train_step(
            cfg, mesh, optimizer=opt)
    if args.init_from:
        from sdag_tpu.models.native_ckpt import load_decoder
        params, init_cfg = load_decoder(args.init_from)
        if init_cfg != cfg:
            raise SystemExit(f"--init-from arch mismatch: ckpt {init_cfg} "
                             f"vs requested {cfg}")
        print(f"[train_qa] warm-started from {args.init_from}", flush=True)
    else:
        params = init_decoder_params(jax.random.PRNGKey(args.seed), cfg)
    print(f"[train_qa] model "
          f"{sum(x.size for x in jax.tree.leaves(params)) / 1e6:.2f}M "
          "params", flush=True)
    state = init_state(params)

    rng = np.random.default_rng(args.seed + 7)
    extra = {"trained_on": "synth_qa", "steps": args.steps,
             "entities": args.entities, "seed": args.seed,
             "k_max": args.k_max, "seq_len": args.seq_len,
             "styled_frac": args.styled_frac, "dup_frac": args.dup_frac,
             "nbr_frac": args.nbr_frac, "answer_form": args.answer_form}

    extra["tokenizer"] = args.tokenizer

    def save(st, tag=""):
        save_decoder(st.params, cfg, args.out, extra=extra)
        save_world(world, os.path.join(args.out, "world.json"))
        if args.tokenizer == "word":
            tokenizer.save(args.out)
        if tag:
            print(f"[train_qa] saved checkpoint ({tag})", flush=True)

    t0 = time.time()
    losses: list = []
    step = 0
    while step < args.steps:
        if chunk > 1:
            s = min(chunk, args.steps - step)
            stacked = sample_batch_stack(rng, tokenizer, train_pool, s,
                                         args.batch, args.seq_len,
                                         k_min=args.k_min,
                                         k_max=args.k_max,
                                         styled_frac=args.styled_frac,
                                         dup_frac=args.dup_frac,
                                         nbr_frac=args.nbr_frac,
                                         answer_form=args.answer_form)
            state, ls = scan_fn(state, {k: jnp.asarray(v)
                                        for k, v in stacked.items()})
            losses.extend(float(x) for x in np.asarray(ls))
            step += s
        else:
            batch = sample_batch(rng, tokenizer, train_pool, args.batch,
                                 args.seq_len, k_min=args.k_min,
                                 k_max=args.k_max,
                                 styled_frac=args.styled_frac,
                                 dup_frac=args.dup_frac,
                                 nbr_frac=args.nbr_frac,
                                 answer_form=args.answer_form)
            state, loss = step_fn(state, batch)
            losses.append(float(loss))
            step += 1
        prev = step - (s if chunk > 1 else 1)
        if step // 50 != prev // 50:
            print(f"[train_qa] step {step}/{args.steps} "
                  f"loss {np.mean(losses[-50:]):.4f} "
                  f"({(time.time() - t0) / step:.2f}s/step)", flush=True)
        if (args.eval_every and
                step // args.eval_every != prev // args.eval_every) \
                or step >= args.steps:
            ev = teacher_forced_eval(state.params, cfg, tokenizer,
                                     eval_pool, eval_distract,
                                     args.seq_len, n=args.eval_n,
                                     answer_form=args.answer_form)
            print(f"[train_qa] step {step} heldout {ev}", flush=True)
            extra["final_eval"] = ev
        if args.save_every and step // args.save_every != \
                prev // args.save_every:
            save(state, tag=f"step {step}")

    save(state, tag="final")
    print(f"[train_qa] done in {time.time() - t0:.0f}s -> {args.out}",
          flush=True)


if __name__ == "__main__":
    main()
