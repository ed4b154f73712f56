"""Distributed sampler invariants + weight tools."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np

import jax.numpy as jnp

from vila_tpu.data.sampler import DistributedSampler
from vila_tpu.utils.weights_tools import apply_delta, make_delta


def test_sampler_partitions_disjoint_and_complete():
    lengths = [100, 64]
    world, bs = 4, 2
    all_idx = []
    for rank in range(world):
        s = DistributedSampler(
            lengths, rank=rank, world_size=world, batch_size=bs, seed=1
        )
        idx = list(s)
        assert len(idx) == len(s)
        all_idx.append(set(idx))
    # disjoint across replicas
    for i in range(world):
        for j in range(i + 1, world):
            assert not (all_idx[i] & all_idx[j])
    # per-dataset drop-last: each dataset contributes a multiple of
    # world*bs in total
    total = sum(len(s) for s in all_idx)
    assert total == (100 // 8) * 8 + (64 // 8) * 8


def test_sampler_sp_groups_identical():
    lengths = [48]
    # world=4, sp=2 -> 2 DP replicas; ranks (0,1) and (2,3) pair up
    samples = [
        list(
            DistributedSampler(
                lengths, rank=r, world_size=4, sp_degree=2, seed=3
            )
        )
        for r in range(4)
    ]
    assert samples[0] == samples[1]
    assert samples[2] == samples[3]
    assert set(samples[0]).isdisjoint(samples[2])


def test_sampler_epoch_changes_order():
    s = DistributedSampler([64], rank=0, world_size=1, seed=0)
    a = list(s)
    s.set_epoch(1)
    b = list(s)
    assert a != b and sorted(a) == sorted(b)


def test_batch_shuffle_keeps_batches_contiguous():
    s = DistributedSampler(
        [32], rank=0, world_size=1, batch_size=4, seed=0,
        shuffle=False, batch_shuffle=True,
    )
    idx = list(s)
    batches = [tuple(idx[i : i + 4]) for i in range(0, len(idx), 4)]
    for b in batches:
        assert list(b) == list(range(b[0], b[0] + 4))


def test_batch_iterator_mixture_fairness():
    """Trainer._batch_iterator must feed ConcatDataset constituent lengths
    into the sampler so per-dataset drop-last arithmetic is live (r2 weak
    #8): every epoch draws a replica-even slice of EACH constituent, not a
    single merged pool."""
    from vila_tpu.data.dataset import ConcatDataset
    from vila_tpu.train.trainer import _batch_iterator

    a = [("a", i) for i in range(37)]
    b = [("b", i) for i in range(11)]
    mix = ConcatDataset([a, b])
    collator = list  # identity: a batch is the list of items

    it = _batch_iterator(
        mix, collator, batch_size=2, seed=0, rank=0, world_size=2
    )
    # one epoch for rank 0 of 2: per-dataset keep = (n // (2*2)) * 2*2,
    # half of it for this replica -> 18 from a, 4 from b, per epoch
    epoch_items = [item for _ in range(11) for item in next(it)]
    from collections import Counter

    src = Counter(name for name, _ in epoch_items)
    assert src["a"] == 18 and src["b"] == 4


def test_delta_roundtrip():
    base = {"a": np.ones((3,), np.float32), "b": {"c": np.zeros((2,))}}
    target = {"a": np.full((3,), 2.5, np.float32), "b": {"c": np.ones((2,))}}
    delta = make_delta(base, target)
    back = apply_delta(base, delta)
    np.testing.assert_allclose(back["a"], target["a"])
    np.testing.assert_allclose(back["b"]["c"], target["b"]["c"])


def test_consolidate_checkpoint_roundtrip(tmp_path):
    """Trainer-run orbax state -> deployable component checkpoint
    (consolidate.py:48 parity): the consolidated dir loads through
    vila_tpu.load and reproduces the trained params' logits."""
    import jax
    import torch

    import vila_tpu
    from helpers import save_tiny_checkpoint
    from vila_tpu import entry
    from vila_tpu.train.checkpoint import CheckpointManager
    from vila_tpu.utils.weights_tools import consolidate_checkpoint

    base = str(tmp_path / "base")
    with torch.no_grad():
        save_tiny_checkpoint(base)
    cfg = entry.build_config(base, dtype="float32")
    params = entry.load_params(base, cfg)

    # "train": perturb params, save a trainer-layout orbax checkpoint
    trained = jax.tree.map(lambda x: x + 0.01, params)
    state = {"params": trained, "opt_state": {"count": jnp.zeros((), jnp.int32)}}
    run = str(tmp_path / "run")
    mgr = CheckpointManager(run, async_save=False)
    mgr.save(3, state)
    mgr.wait()
    mgr.close()

    out = str(tmp_path / "consolidated")
    template = {"params": params, "opt_state": {"count": jnp.zeros((), jnp.int32)}}
    consolidate_checkpoint(run, template, base, out)

    eng = vila_tpu.load(out)
    got = np.asarray(
        jax.tree.leaves(eng.params["mm_projector"])[0], np.float32
    )
    want = np.asarray(jax.tree.leaves(trained["mm_projector"])[0], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)
