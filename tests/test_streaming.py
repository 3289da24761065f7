"""Streaming/sharded ingestion tests (data/streaming.py).

The contract under test: the rank-order concatenation of every process's
local batches equals the deterministic single-host batch stream (exactly
once per epoch, fixed shapes, remainder dropped); prefetch and mid-epoch
resume never skip or duplicate a batch; and the local→global bridge feeds
`train.make_dp_train_step` with a step identical to single-device training.
"""
import numpy as np
import pytest

from uni_adapter_tpu.data.streaming import (ShardedCorpus, StreamingLoader,
                                            global_batch)

N, C, D = 8, 6, 4        # xyz+rgb channels — what Uni3D's grouping expects
SHARD_SIZES = (5, 7, 4)          # 16 samples total


@pytest.fixture()
def corpus(tmp_path):
    g = 0
    pc_paths, text_paths, image_paths = [], [], []
    for si, n in enumerate(SHARD_SIZES):
        pc = np.zeros((n, N, C), np.float32)
        tx = np.zeros((n, D), np.float32)
        im = np.zeros((n, D), np.float32)
        for r in range(n):
            pc[r] = g                    # sample content encodes global id
            tx[r] = 10 * g
            im[r] = 100 * g
            g += 1
        for arr, paths, tag in ((pc, pc_paths, "pc"), (tx, text_paths, "tx"),
                                (im, image_paths, "im")):
            p = str(tmp_path / f"{tag}_{si}.npy")
            np.save(p, arr)
            paths.append(p)
    return ShardedCorpus(pc_paths, text_paths, image_paths)


def _ids(batch):
    return batch["pc"][:, 0, 0].astype(int)


def test_corpus_gather_maps_global_indices(corpus):
    idx = np.array([0, 4, 5, 11, 12, 15])   # spans all three shards
    b = corpus.gather(idx)
    assert np.array_equal(_ids(b), idx)
    assert np.array_equal(b["text_embed"][:, 0].astype(int), 10 * idx)
    assert np.array_equal(b["image_embed"][:, 0].astype(int), 100 * idx)
    # per-row mask: sample 0's image row is all-zero (100·0) — "no render
    # for this sample", mask 0 per the ShardedCorpus docstring contract
    assert b["mask"].tolist() == [0.0] + [1.0] * (len(idx) - 1)
    assert len(corpus) == sum(SHARD_SIZES)


def test_corpus_rejects_mismatched_shard_shapes(corpus, tmp_path):
    """Shape validation happens at construction: a broadcastable (n, 1)
    embedding shard would otherwise silently TILE wrong values into the
    training data, and a different-N pc shard would crash only when the
    epoch permutation first touches it."""
    pc_paths = [str(tmp_path / f"pc_{i}.npy") for i in range(len(SHARD_SIZES))]
    tx_ok = [str(tmp_path / f"tx_{i}.npy") for i in range(len(SHARD_SIZES))]
    # (n, 1) embeddings next to (n, D): broadcastable, would silently tile
    bad_tx = str(tmp_path / "bad_tx.npy")
    np.save(bad_tx, np.full((SHARD_SIZES[1], 1), 7, np.float32))
    with pytest.raises(ValueError, match="text shard 1"):
        ShardedCorpus(pc_paths, [tx_ok[0], bad_tx, tx_ok[2]])
    # different N: would crash mid-epoch, not at construction
    bad_pc = str(tmp_path / "bad_pc.npy")
    np.save(bad_pc, np.zeros((SHARD_SIZES[1], 2 * N, C), np.float32))
    with pytest.raises(ValueError, match="pc shard 1"):
        ShardedCorpus([pc_paths[0], bad_pc], tx_ok[:2])


def test_epoch_coverage_and_rank_concatenation(corpus):
    """Two simulated processes: concatenating their local batches in rank
    order reconstructs the global permutation, each sample once/epoch."""
    loaders = [StreamingLoader(corpus, global_batch_size=4, seed=7,
                               process_index=p, process_count=2, prefetch=0)
               for p in range(2)]
    assert loaders[0].steps_per_epoch == 4
    seen = []
    for _ in range(4):
        b0, b1 = next(loaders[0]), next(loaders[1])
        assert b0["step"] == b1["step"]
        seen.extend(_ids(b0).tolist() + _ids(b1).tolist())
    assert len(seen) == 16 and sorted(seen) == sorted(set(seen))
    # equals the single-process stream over the same schedule
    solo = StreamingLoader(corpus, global_batch_size=4, seed=7,
                           process_index=0, process_count=1, prefetch=0)
    solo_ids = np.concatenate([_ids(next(solo)) for _ in range(4)])
    assert np.array_equal(np.array(seen), solo_ids)


def test_epochs_reshuffle_deterministically(corpus):
    mk = lambda: StreamingLoader(corpus, 16, seed=3, process_index=0,
                                 process_count=1, prefetch=0)
    a, b = mk(), mk()
    e0a, e1a = _ids(next(a)), _ids(next(a))
    e0b, e1b = _ids(next(b)), _ids(next(b))
    assert np.array_equal(e0a, e0b) and np.array_equal(e1a, e1b)
    assert not np.array_equal(e0a, e1a)          # epoch 1 reshuffled
    assert sorted(e1a.tolist()) == list(range(16))


def test_prefetch_matches_sync(corpus):
    sync = StreamingLoader(corpus, 8, seed=1, process_index=0,
                           process_count=1, prefetch=0)
    pre = StreamingLoader(corpus, 8, seed=1, process_index=0,
                          process_count=1, prefetch=3)
    for _ in range(5):
        bs, bp = next(sync), next(pre)
        assert bs["step"] == bp["step"]
        for k in ("pc", "text_embed", "image_embed", "mask"):
            assert np.array_equal(bs[k], bp[k])
    pre.close()


def test_resume_mid_epoch_with_prefetch(corpus):
    a = StreamingLoader(corpus, 4, seed=9, process_index=0,
                        process_count=1, prefetch=2)
    consumed = [next(a) for _ in range(3)]
    assert [b["step"] for b in consumed] == [0, 1, 2]
    state = a.state_dict()
    assert state == {"epoch": 0, "step": 3, "seed": 9}
    tail_a = [next(a) for _ in range(3)]          # crosses the epoch edge
    a.close()

    b = StreamingLoader(corpus, 4, seed=9, process_index=0,
                        process_count=1, prefetch=2)
    b.load_state_dict(state)
    tail_b = [next(b) for _ in range(3)]
    for x, y in zip(tail_a, tail_b):
        assert x["step"] == y["step"]
        assert np.array_equal(x["pc"], y["pc"])
    b.close()

    # load_state_dict also rewinds an already-running loader
    c = StreamingLoader(corpus, 4, seed=9, process_index=0,
                        process_count=1, prefetch=2)
    [next(c) for _ in range(5)]
    c.load_state_dict(state)
    assert np.array_equal(next(c)["pc"], tail_a[0]["pc"])
    c.close()


def test_validation_errors(corpus, tmp_path):
    with pytest.raises(ValueError, match="not divisible"):
        StreamingLoader(corpus, 5, process_index=0, process_count=2)
    with pytest.raises(ValueError, match="< one global batch"):
        StreamingLoader(corpus, 32, process_index=0, process_count=1)
    ld = StreamingLoader(corpus, 4, seed=1, process_index=0, process_count=1)
    with pytest.raises(ValueError, match="seed"):
        ld.load_state_dict({"epoch": 0, "step": 0, "seed": 2})
    bad = str(tmp_path / "bad.npy")
    np.save(bad, np.zeros((3, D), np.float32))   # wrong row count
    with pytest.raises(ValueError, match="rows"):
        ShardedCorpus([str(tmp_path / "pc_0.npy")], [bad])


def test_no_image_shards_zero_mask(corpus, tmp_path):
    c = ShardedCorpus([str(tmp_path / "pc_0.npy")],
                      [str(tmp_path / "tx_0.npy")])
    b = c.gather(np.arange(3))
    assert b["mask"].tolist() == [0.0, 0.0, 0.0]
    assert np.array_equal(b["image_embed"], np.zeros((3, D), np.float32))


def test_global_batch_feeds_dp_train_step(corpus):
    """Streamed local batch → sharded global array → shard_map DP step,
    equal to the single-device step on the same batch."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from uni_adapter_tpu.models.uni3d import Uni3D
    from uni_adapter_tpu.train import (init_train_state, make_dp_train_step,
                                       make_optimizer, train_step)

    ld = StreamingLoader(corpus, 8, seed=0, process_index=0,
                         process_count=1, prefetch=0)
    local = next(ld)

    model = Uni3D(trans_dim=16, embed_dim=D, num_group=4, group_size=4,
                  encoder_dim=8, depth=1, num_heads=2, dtype=jnp.float32)
    tx = make_optimizer(lr=1e-3, total_steps=10, warmup_steps=1)
    state = init_train_state(model, jax.random.PRNGKey(0),
                             jnp.asarray(local["pc"][:1]), tx)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    gb = global_batch(local, mesh, "dp")
    assert gb["pc"].shape == local["pc"].shape
    assert gb["pc"].sharding.spec[0] == "dp"
    dp_step = make_dp_train_step(model, tx, mesh)
    st_dp, m_dp = dp_step(state, gb["pc"], gb["text_embed"],
                          gb["image_embed"], gb["mask"])
    st_1, m_1 = train_step(model, tx, state, jnp.asarray(local["pc"]),
                           jnp.asarray(local["text_embed"]),
                           jnp.asarray(local["image_embed"]),
                           jnp.asarray(local["mask"]))
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_1["loss"]),
                               rtol=1e-5)
    l_dp = jax.tree_util.tree_leaves(st_dp.params)
    l_1 = jax.tree_util.tree_leaves(st_1.params)
    for x, y in zip(l_dp, l_1):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-5, rtol=1e-4)


def test_pretrain_cli_smoke_and_resume(tmp_path):
    """pretrain.py end to end (synthetic corpus) + checkpoint resume:
    run 4 steps in one go vs 2+2 with a resume — identical final params."""
    import jax
    import pretrain

    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    common = ["--device", "cpu", "--batch-size", "8", "--depth", "1",
              "--trans-dim", "16", "--embed-dim", "16", "--num-group", "4",
              "--group-size", "4", "--encoder-dim", "8", "--heads", "2",
              "--warmup-steps", "1", "--log-every", "2", "--prefetch", "0"]
    st_a = pretrain.main(common + ["--out", out_a, "--steps", "4",
                                   "--ckpt-every", "100"])
    pretrain.main(common + ["--out", out_b, "--steps", "2",
                            "--ckpt-every", "2"])
    st_b = pretrain.main(common + ["--out", out_b, "--steps", "4",
                                   "--ckpt-every", "100", "--resume"])
    assert int(st_a.step) == int(st_b.step) == 4
    # resuming under a different data seed or batch size must refuse
    with pytest.raises(ValueError, match="data_seed"):
        pretrain.main(common + ["--out", out_b, "--steps", "6",
                                "--seed", "1", "--resume"])
    # ... as must an optimizer-recipe change (silently different trajectory)
    with pytest.raises(ValueError, match="lr"):
        pretrain.main(common + ["--out", out_b, "--steps", "4",
                                "--lr", "0.01", "--resume"])
    for x, y in zip(jax.tree_util.tree_leaves(st_a.params),
                    jax.tree_util.tree_leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-6, rtol=1e-5)


def test_pretrain_cli_async_checkpoint(tmp_path):
    """--ckpt-async (background-thread snapshots) is trajectory-neutral:
    async 2+2 resumed equals sync 4-in-one-go, and the drained final
    checkpoint is complete and loadable."""
    import jax
    import pretrain

    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    common = ["--device", "cpu", "--batch-size", "8", "--depth", "1",
              "--trans-dim", "16", "--embed-dim", "16", "--num-group", "4",
              "--group-size", "4", "--encoder-dim", "8", "--heads", "2",
              "--warmup-steps", "1", "--log-every", "2", "--prefetch", "0"]
    st_a = pretrain.main(common + ["--out", out_a, "--steps", "4",
                                   "--ckpt-every", "100"])
    pretrain.main(common + ["--out", out_b, "--steps", "2",
                            "--ckpt-every", "1", "--ckpt-async"])
    st_b = pretrain.main(common + ["--out", out_b, "--steps", "4",
                                   "--ckpt-every", "100", "--ckpt-async",
                                   "--resume"])
    assert int(st_a.step) == int(st_b.step) == 4
    for x, y in zip(jax.tree_util.tree_leaves(st_a.params),
                    jax.tree_util.tree_leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-6, rtol=1e-5)


def test_pretrain_cli_pp_mode(tmp_path):
    """--parallel pp trains, checkpoints, and resumes: 4 steps in one go
    vs 2+2 resumed give identical final params; resuming a pp checkpoint
    under --parallel dp (or vice versa) refuses."""
    import jax
    import pretrain

    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    common = ["--device", "cpu", "--batch-size", "8", "--depth", "2",
              "--trans-dim", "16", "--embed-dim", "16", "--num-group", "4",
              "--group-size", "4", "--encoder-dim", "8", "--heads", "2",
              "--warmup-steps", "1", "--log-every", "2", "--prefetch", "0",
              "--parallel", "pp", "--pp-stages", "2",
              "--pp-microbatches", "2"]
    st_a = pretrain.main(common + ["--out", out_a, "--steps", "4",
                                   "--ckpt-every", "100"])
    pretrain.main(common + ["--out", out_b, "--steps", "2",
                            "--ckpt-every", "2"])
    st_b = pretrain.main(common + ["--out", out_b, "--steps", "4",
                                   "--ckpt-every", "100", "--resume"])
    assert int(st_a.step) == int(st_b.step) == 4
    for x, y in zip(jax.tree_util.tree_leaves(st_a.params),
                    jax.tree_util.tree_leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-6, rtol=1e-5)
    # param layouts differ between the modes — cross-mode resume refuses
    with pytest.raises(ValueError, match="parallel"):
        pretrain.main([a for a in common if a not in ("--parallel", "pp")]
                      + ["--out", out_b, "--steps", "6", "--resume"])
    # a stage-count mismatch would silently drop trunk blocks (each stage
    # scans only its local slice) — refuse
    i = common.index("--pp-stages")
    restaged = common[:i + 1] + ["1"] + common[i + 2:]
    with pytest.raises(ValueError, match="pp_stages"):
        pretrain.main(restaged + ["--out", out_b, "--steps", "6",
                                  "--resume"])


def test_pretrain_cli_sp_mode(tmp_path):
    """--parallel sp trains, checkpoints, and resumes: 4 steps in one go
    vs 2+2 resumed give identical final params; cross-mode resume under
    --parallel dp refuses (the sp tree stacks the trunk blocks)."""
    import jax
    import pretrain

    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    common = ["--device", "cpu", "--batch-size", "8", "--depth", "2",
              "--trans-dim", "16", "--embed-dim", "16", "--num-group", "4",
              "--group-size", "4", "--encoder-dim", "8", "--heads", "2",
              "--warmup-steps", "1", "--log-every", "2", "--prefetch", "0",
              "--parallel", "sp"]
    st_a = pretrain.main(common + ["--out", out_a, "--steps", "4",
                                   "--ckpt-every", "100"])
    pretrain.main(common + ["--out", out_b, "--steps", "2",
                            "--ckpt-every", "2"])
    st_b = pretrain.main(common + ["--out", out_b, "--steps", "4",
                                   "--ckpt-every", "100", "--resume"])
    assert int(st_a.step) == int(st_b.step) == 4
    for x, y in zip(jax.tree_util.tree_leaves(st_a.params),
                    jax.tree_util.tree_leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-6, rtol=1e-5)
    with pytest.raises(ValueError, match="parallel"):
        pretrain.main([a for a in common if a not in ("--parallel", "sp")]
                      + ["--out", out_b, "--steps", "6", "--resume"])


class _FlakyCorpus:
    """Delegating corpus whose gather fails on command (transient IO)."""

    def __init__(self, inner):
        self.inner = inner
        self.fail_next = 0

    def __len__(self):
        return len(self.inner)

    def gather(self, idx):
        if self.fail_next > 0:
            self.fail_next -= 1
            raise ValueError("transient read failure")
        return self.inner.gather(idx)


def test_transient_gather_failure_is_retryable_sync(corpus):
    flaky = _FlakyCorpus(corpus)
    ld = StreamingLoader(flaky, 4, seed=5, process_index=0,
                         process_count=1, prefetch=0)
    ref = StreamingLoader(corpus, 4, seed=5, process_index=0,
                          process_count=1, prefetch=0)
    b0 = next(ld)
    flaky.fail_next = 1
    with pytest.raises(ValueError, match="transient"):
        next(ld)
    b1 = next(ld)                       # retry re-assembles the SAME batch
    r0, r1 = next(ref), next(ref)
    assert b0["step"] == 0 and b1["step"] == 1
    assert np.array_equal(b0["pc"], r0["pc"])
    assert np.array_equal(b1["pc"], r1["pc"])


def test_transient_gather_failure_is_retryable_prefetch(corpus):
    flaky = _FlakyCorpus(corpus)
    flaky.fail_next = 1                 # first producer assemble fails
    ld = StreamingLoader(flaky, 4, seed=5, process_index=0,
                         process_count=1, prefetch=2)
    with pytest.raises(ValueError, match="transient"):
        next(ld)
    b0 = next(ld)                       # fresh thread, same failed batch
    ref = StreamingLoader(corpus, 4, seed=5, process_index=0,
                          process_count=1, prefetch=0)
    assert b0["step"] == 0
    assert np.array_equal(b0["pc"], next(ref)["pc"])
    ld.close()


def test_pretrain_cli_pp_tp_mode(tmp_path):
    """--parallel pp --pp-tp-size 2 trains on a (stage, model) mesh and
    tracks the stage-only run's trajectory.  Tolerance is absolute at the
    Adam-step scale (lr 1e-3): GSPMD's reordered model-axis all-reduces
    perturb near-zero gradients enough to flip a normalized Adam update's
    sign on near-zero params, so exact equality is not contractual — but
    a layout bug (dropped blocks, wrong shard) diverges at 1e-1 scale."""
    import jax
    import pretrain

    common = ["--device", "cpu", "--batch-size", "8", "--depth", "2",
              "--trans-dim", "16", "--embed-dim", "16", "--num-group", "4",
              "--group-size", "4", "--encoder-dim", "8", "--heads", "2",
              "--warmup-steps", "1", "--log-every", "2", "--prefetch", "0",
              "--parallel", "pp", "--pp-stages", "2",
              "--pp-microbatches", "2", "--steps", "4",
              "--ckpt-every", "100"]
    st_pp = pretrain.main(common + ["--out", str(tmp_path / "pp")])
    st_tp = pretrain.main(common + ["--pp-tp-size", "2",
                                    "--out", str(tmp_path / "pptp")])
    assert int(st_pp.step) == int(st_tp.step) == 4
    for x, y in zip(jax.tree_util.tree_leaves(st_pp.params),
                    jax.tree_util.tree_leaves(st_tp.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=5e-3, rtol=1e-3)
    # indivisible tp size refuses up front
    with pytest.raises(ValueError, match="pp-tp-size"):
        pretrain.main(common + ["--pp-tp-size", "3",
                                "--out", str(tmp_path / "bad")])
