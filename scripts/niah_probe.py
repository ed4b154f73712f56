"""NIAH accuracy signal without real weights (VERDICT r4 #9).

Round 3 executed a 262k-token zigzag-ring NIAH sweep, but with random
weights the decode emitted a constant token — the heatmap was degenerate
(all-101s), proving plumbing, not that `eval/niah.py` measures retrieval.
This script trains a TINY LLM on a synthetic needle-retrieval task —
filler tokens, a planted `[MARKER, v1..v4]` needle at a random depth, a
`MARKER` query cue at the end of the context, answer = the 4 value
tokens — with a short length curriculum (2k -> 32k), then runs
`eval/niah.py:run_niah` zigzag-ring over the 8-device mesh for a
(context, depth) heatmap. Accuracy far above the 1/504-per-token chance
floor proves the eval detects retrieval; depth/length structure is real
signal.

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
FILLER_LO, FILLER_HI = 8, 512  # filler/value token range (excludes MARKER)
ANSWER_LEN = 4


def build_cfg():
    from vila_tpu.models import qwen2

    # rope_theta 1e6 = Qwen2's native 32k setting, so every eval position
    # is inside the RoPE regime the task is trained under
    return qwen2.LLMConfig(
        vocab_size=512, hidden_size=128, intermediate_size=384,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        rope_theta=1e6, dtype="float32", tie_word_embeddings=True,
    )


def make_batch(rng: np.random.Generator, batch: int, ctx: int):
    """(input_ids, labels) — labels IGNOREd (=-1 here) except the
    ANSWER_LEN teacher-forced answer tokens after the query MARKER."""
    s = ctx + ANSWER_LEN
    ids = rng.integers(FILLER_LO, FILLER_HI, (batch, s), dtype=np.int64)
    labels = np.full((batch, s), -1, np.int64)
    needle_len = 1 + ANSWER_LEN
    for b in range(batch):
        vals = rng.integers(FILLER_LO, FILLER_HI, ANSWER_LEN)
        pos = int(rng.integers(0, ctx - needle_len - 1))
        ids[b, pos] = MARKER
        ids[b, pos + 1 : pos + needle_len] = vals
        ids[b, ctx - 1] = MARKER  # query cue
        ids[b, ctx:] = vals  # teacher-forced answer
        labels[b, ctx:] = vals
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
    import jax
    import jax.numpy as jnp
    import optax

    from vila_tpu.models import qwen2

    cfg = build_cfg()
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg)
    print("backend:", jax.devices()[0].platform, flush=True)

    opt = optax.adamw(
        optax.warmup_cosine_decay_schedule(
            0.0, args.lr, warmup_steps=40, decay_steps=args.steps,
            end_value=args.lr * 0.05,
        ),
        weight_decay=0.0,
    )
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

    # length curriculum: the induction-style retrieval circuit forms at 2k,
    # then longer contexts harden it at larger relative distances
    curriculum = [
        (2048, 16, args.steps // 2),
        (8192, 4, args.steps // 4),
        (16384, 2, args.steps // 8),
        (32768, 1, args.steps - args.steps // 2 - args.steps // 4
         - args.steps // 8),
    ]
    rng = np.random.default_rng(0)
    train_log = []
    it = 0
    for ctx, bsz, n in curriculum:
        for k in range(n):
            ids, labels = make_batch(rng, bsz, ctx)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(ids), jnp.asarray(labels))
            if k == n - 1 or (it % 50 == 0):
                v_ids, v_lab = make_batch(rng, max(bsz, 2), ctx)
                acc = float(answer_acc(
                    params, jnp.asarray(v_ids), jnp.asarray(v_lab)))
                print(f"step {it} ctx {ctx}: loss {float(loss):.4f} "
                      f"heldout-acc {acc:.3f}", flush=True)
                if k == n - 1:
                    train_log.append(
                        {"ctx": ctx, "final_heldout_acc": acc})
            it += 1

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
    vals = rng.integers(FILLER_LO, FILLER_HI, ANSWER_LEN)
    needle_ids = np.concatenate([[MARKER], vals])

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
        query=emb([MARKER]),
    )
    for r in results:
        print(r, flush=True)

    meta = {}
    if os.path.exists(PARAMS_NPZ + ".json"):
        with open(PARAMS_NPZ + ".json") as f:
            meta = json.load(f)
    mean_acc = float(np.mean([r["acc"] for r in results]))
    out = {
        "task": "token NIAH (planted [MARKER,v1..v4], MARKER query cue)",
        "model": "tiny 2L/128d probe, rope_theta 1e6, trained by "
                 "scripts/niah_probe.py train (curriculum 2k->32k)",
        "mesh": f"sp={n_dev} zigzag ring (eval/niah.py "
                "forward_embeds_sharded)",
        "chance_per_token": round(1.0 / (FILLER_HI - FILLER_LO), 5),
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
    tr.add_argument("--steps", type=int, default=800)
    tr.add_argument("--lr", type=float, default=1e-3)
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
        cmd_train(args)


if __name__ == "__main__":
    main()
