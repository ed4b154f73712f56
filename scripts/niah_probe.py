"""NIAH accuracy signal without real weights (VERDICT r4 #9).

Round 3 executed a 262k-token zigzag-ring NIAH sweep, but with random
weights the decode emitted a constant token — the heatmap was degenerate
(all-101s), proving plumbing, not that `eval/niah.py` measures retrieval.
This script trains a TINY LLM on keyed associative recall — N_PAIRS
needles `[MARKER, key_i, v_i1..v_i4]` planted at random depths in filler,
then queries `[MARKER, key_j] -> v_j1..v_j4` at the end of the context —
and runs `eval/niah.py:run_niah` zigzag-ring over the 8-device mesh for a
(context, depth) heatmap (eval needle = `[MARKER, key, v1..v4]`, query =
`[MARKER, key]`, exactly the training format with one pair). Accuracy far
above the 1/64-per-token chance floor proves the eval detects retrieval.

Task-design note (r5, measured): a single unkeyed needle with one query
gives 4 supervised tokens per sequence — after 1,400 steps at 2k ctx the
loss sat at the ln(64) value-prior floor and retrieval never formed.
Multi-pair keyed recall supervises 4 retrievals per sequence with varied
keys/depths, the canonical regime where the induction/recall circuit
forms.

Reference anchor: llava/eval/vision_niah_vila/eval_vision_niah.py
(needle spliced into a long embedding haystack, teacher-forced argmax
accuracy over (context, depth)), without the multi-GPU monkey-patch.

Two invocations (backends differ, so one process cannot do both):
  python scripts/niah_probe.py train            # TPU (or CPU) training
  python scripts/niah_probe.py eval --round 5   # CPU 8-dev zigzag mesh
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

PARAMS_NPZ = "/tmp/niah_probe_params.npz"
MARKER = 1
# Filler is DISJOINT from keys/values/marker. With overlapping ranges the
# task never trains (r5 measured, CPU + TPU, 800-2000 steps, loss pinned
# at the ln 64 value prior): a key token recurs ~59x in 232 filler
# positions, so the (key -> next-token) induction signal the retrieval
# circuit bootstraps from is drowned in contradictory bindings. Canonical
# associative-recall setups (zoology/Based) keep the vocab roles disjoint.
FILLER_LO, FILLER_HI = 280, 512
VAL_LO, VAL_HI = 8, 72  # answer values: a 64-token subrange, so the model
# first learns the output prior (loss ~ln 64) and then retrieval proper —
# a full-range value set kept the loss pinned at the ln(504) floor for
# 400 steps (r5 measured)
KEY_LO, KEY_HI = 128, 256  # needle keys (disjoint from values)
ANSWER_LEN = 4
N_PAIRS = 4  # needles per training sequence; all 4 are queried


def build_cfg():
    from vila_tpu.models import qwen2

    # rope_theta 1e6 = Qwen2's native 32k setting, so every eval position
    # is inside the RoPE regime the task is trained under. head_dim must
    # be 128: the flash kernel rejects d % 128 != 0 (ops/attention.py:
    # _pallas_supported) and autodiff through the blocked fallback OOMs
    # at 8k ctx (r5 measured: 26.5 GiB of scan residuals).
    return qwen2.LLMConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=3, num_attention_heads=2, num_key_value_heads=2,
        rope_theta=1e6, dtype="float32", tie_word_embeddings=True,
    )


def make_batch(rng: np.random.Generator, batch: int, ctx: int):
    """(input_ids, labels): N_PAIRS needles `[M, key_i, v_i1..v_i4]` at
    random non-overlapping depths in filler, then N_PAIRS queries
    `[M, key_j, v_j1..v_j4]` (shuffled order) at the end. Total length ==
    ctx (a 128-multiple so the flash kernel accepts it); labels IGNOREd
    (-1) except the value tokens inside queries."""
    needle_len = 2 + ANSWER_LEN  # M, key, values
    tail = N_PAIRS * needle_len  # queries, teacher-forced
    ids = rng.integers(FILLER_LO, FILLER_HI, (batch, ctx), dtype=np.int64)
    labels = np.full((batch, ctx), -1, np.int64)
    body = ctx - tail
    for b in range(batch):
        keys = rng.choice(
            np.arange(KEY_LO, KEY_HI), size=N_PAIRS, replace=False)
        vals = rng.integers(VAL_LO, VAL_HI, (N_PAIRS, ANSWER_LEN))
        # non-overlapping random slots for the needles (slot-aligned so
        # two adjacent slots can never overlap)
        slots = np.sort(rng.choice(
            body // needle_len - 1, size=N_PAIRS, replace=False))
        for i, slot in enumerate(slots):
            pos = int(slot) * needle_len
            ids[b, pos] = MARKER
            ids[b, pos + 1] = keys[i]
            ids[b, pos + 2 : pos + needle_len] = vals[i]
        order = rng.permutation(N_PAIRS)
        at = body
        for j in order:
            ids[b, at] = MARKER
            ids[b, at + 1] = keys[j]
            ids[b, at + 2 : at + needle_len] = vals[j]
            labels[b, at + 2 : at + needle_len] = vals[j]
            at += needle_len
    return ids.astype(np.int32), labels.astype(np.int32)


def flatten_params(params):
    import jax

    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    return {jax.tree_util.keystr(path): np.asarray(x)
            for path, x in leaves}


def unflatten_params(cfg, npz):
    import jax

    from vila_tpu.models import qwen2

    tmpl = jax.eval_shape(
        lambda r: qwen2.init_params(r, cfg), jax.random.PRNGKey(0),
    )
    paths, treedef = jax.tree_util.tree_flatten_with_path(tmpl)
    leaves = [np.asarray(npz[jax.tree_util.keystr(p)]) for p, _ in paths]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def cmd_train(args):
    """Dense-first curriculum (r5, measured):

    Jumping straight to needles-in-filler never trains — at every tried
    ctx (256-32k), lr, and backend the loss pins at the ln(64) value
    prior (the 16 supervised tokens/sequence are swamped before the
    retrieval circuit exists), while a DENSE associative-recall stage
    (needles back-to-back, no filler) starts learning within 300 steps.
    And naive stage jumps catastrophically reset the circuit (acc 0.12 ->
    chance on a 56->64-token switch), so growth stages REPLAY all earlier
    lengths interleaved. Pure copy sanity-trains to 1.000 in <100 steps
    at these widths, so the model is never the bottleneck."""
    import jax
    import jax.numpy as jnp
    import optax

    from vila_tpu.models import qwen2

    cfg = build_cfg()
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg)
    print("backend:", jax.devices()[0].platform, flush=True)

    opt = optax.adamw(args.lr, weight_decay=0.0)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, ids, labels):
        def loss_fn(p):
            logits, _ = qwen2.forward(p, cfg, input_ids=ids)
            # next-token: logits[:, t] predicts token t+1
            tgt = labels[:, 1:]
            lg = logits[:, :-1]
            m = (tgt >= 0).astype(jnp.float32)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                lg, jnp.maximum(tgt, 0)
            )
            return (ce * m).sum() / m.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def answer_acc(params, ids, labels):
        logits, _ = qwen2.forward(params, cfg, input_ids=ids)
        tgt, lg = labels[:, 1:], logits[:, :-1]
        m = tgt >= 0
        hit = (jnp.argmax(lg, -1) == tgt) & m
        return hit.sum() / m.sum()

    rng = np.random.default_rng(0)
    train_log = []

    def eval_at(ctx, bsz=16):
        v_ids, v_lab = make_batch(rng, bsz, ctx)
        return float(answer_acc(
            params, jnp.asarray(v_ids), jnp.asarray(v_lab)))

    needle_len = 2 + ANSWER_LEN
    dense = (2 * N_PAIRS + 1) * needle_len  # needles + queries + 1 slack
    dense = ((dense + 15) // 16) * 16
    # stage 1: dense associative recall until the circuit forms
    for it in range(args.steps):
        ids, labels = make_batch(rng, 64, dense)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(ids), jnp.asarray(labels))
        if it % 50 == 0 or it == args.steps - 1:
            acc = eval_at(dense)
            print(f"dense step {it}: loss {float(loss):.4f} "
                  f"acc {acc:.3f}", flush=True)
            if acc > 0.95:
                break
    train_log.append({"ctx": dense, "final_heldout_acc": eval_at(dense)})

    # stage 2: grow filler with replay of every earlier length
    seen = [dense]
    growth = [c for c in (128, 256, 512, 1024, 2048, 4096, 8192,
                          16384, 32768)
              if dense < c <= args.max_ctx]
    for ctx in growth:
        seen.append(ctx)
        bsz = max(2, min(32, args.batch_tokens // ctx))
        for it in range(args.growth_steps):
            c = ctx if it % 2 == 0 else seen[(it // 2) % len(seen)]
            ids, labels = make_batch(
                rng, max(2, min(32, args.batch_tokens // c)), c)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(ids), jnp.asarray(labels))
            if it % 50 == 0 or it == args.growth_steps - 1:
                print(f"ctx {ctx} step {it}: loss {float(loss):.4f} "
                      f"acc@{ctx} {eval_at(ctx, bsz):.3f} "
                      f"acc@dense {eval_at(dense):.3f}", flush=True)
        train_log.append({"ctx": ctx, "final_heldout_acc": eval_at(ctx, bsz)})

    np.savez(PARAMS_NPZ, **flatten_params(params))
    with open(PARAMS_NPZ + ".json", "w") as f:
        json.dump({"train_log": train_log, "steps": args.steps}, f)
    print("saved ->", PARAMS_NPZ)


def cmd_eval(args):
    import jax
    import jax.numpy as jnp

    from vila_tpu.eval import niah
    from vila_tpu.models import qwen2
    from vila_tpu.parallel.mesh import make_mesh

    cfg = build_cfg()
    params = unflatten_params(cfg, np.load(PARAMS_NPZ))
    n_dev = len(jax.devices())
    mesh = make_mesh(sp=n_dev)
    print(f"mesh: sp={n_dev} zigzag ring on", jax.devices()[0].platform,
          flush=True)

    rng = np.random.default_rng(123)
    max_ctx = max(args.contexts)
    hay_ids = rng.integers(FILLER_LO, FILLER_HI, max_ctx)
    key = int(rng.integers(KEY_LO, KEY_HI))
    vals = rng.integers(VAL_LO, VAL_HI, ANSWER_LEN)
    needle_ids = np.concatenate([[MARKER, key], vals])

    def emb(token_ids):
        return qwen2.embed_tokens(
            params, cfg, jnp.asarray(np.asarray(token_ids)[None]))[0]

    results = niah.run_niah(
        params, cfg,
        haystack=emb(hay_ids),
        needle=emb(needle_ids),
        answer_ids=np.asarray(vals),
        niah=niah.NIAHConfig(
            context_lengths=tuple(args.contexts),
            depths=(0.0, 0.25, 0.5, 0.75, 1.0),
        ),
        mesh=mesh,
        query=emb([MARKER, key]),
    )
    for r in results:
        print(r, flush=True)

    meta = {}
    if os.path.exists(PARAMS_NPZ + ".json"):
        with open(PARAMS_NPZ + ".json") as f:
            meta = json.load(f)
    mean_acc = float(np.mean([r["acc"] for r in results]))
    out = {
        "task": "token NIAH via keyed associative recall "
                "([MARKER,key,v1..v4] needle, [MARKER,key] query)",
        "model": "tiny 3L/256d probe, rope_theta 1e6, trained by "
                 "scripts/niah_probe.py train (dense-first associative "
                 "recall, then filler growth with replay)",
        "mesh": f"sp={n_dev} zigzag ring (eval/niah.py "
                "forward_embeds_sharded)",
        "chance_per_token": round(1.0 / (VAL_HI - VAL_LO), 5),
        "heatmap": results,
        "mean_acc": mean_acc,
        "train": meta,
        "ok": mean_acc > 0.5,
    }
    print(json.dumps({k: v for k, v in out.items() if k != "heatmap"},
                     indent=2))
    if args.round:
        fname = os.path.join(REPO, f"NIAH_r{args.round:02d}.json")
        with open(fname, "w") as f:
            json.dump(out, f, indent=2)
        print("wrote", fname)


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    tr = sub.add_parser("train")
    tr.add_argument("--steps", type=int, default=4000)
    tr.add_argument("--growth_steps", type=int, default=300)
    tr.add_argument("--lr", type=float, default=2e-3)
    tr.add_argument("--max_ctx", type=int, default=32768,
                    help="cap stage-2 growth (CPU boxes: 2048)")
    tr.add_argument("--batch_tokens", type=int, default=65536,
                    help="token budget per stage-2 batch")
    ev = sub.add_parser("eval")
    ev.add_argument("--round", type=int, default=0)
    ev.add_argument("--contexts", type=int, nargs="+",
                    default=[8192, 16384, 32768])
    args = ap.parse_args()
    if args.cmd == "eval":
        # must happen before the first jax import in this process
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
        cmd_eval(args)
    else:
        if os.environ.get("JAX_PLATFORMS") == "cpu":
            # the ambient env re-pins the TPU plugin even over the env
            # var (see tests/conftest.py) — the config update is the
            # only reliable override
            import jax

            jax.config.update("jax_platforms", "cpu")
        cmd_train(args)


if __name__ == "__main__":
    main()
