"""Training driver (CLI) smoke tests: config parsing, short toy run with
artifacts (metrics JSONL, sample dumps, checkpoints), resume path."""

import json
import os

import numpy as np
import pytest

from otgan_tpu.config import TrainConfig, parse_args


def test_parse_args_defaults_and_flags():
    cfg = parse_args([])
    assert cfg.sinkhorn_lambda == 500.0 and cfg.nr_sinkhorn_iter == 500
    cfg = parse_args(
        [
            "--model", "densenet",
            "--batch_size", "128",
            "--single_batch",
            "--no_sinkhorn",
            "--train_disc_against_ema",
            "--optimizer", "adamax",
            "--nr_gen_per_disc", "3",
            "--learning_rate_disc", "0.001",
        ]
    )
    assert cfg.model == "densenet"
    assert cfg.batch_size == 128
    assert cfg.single_batch and cfg.no_sinkhorn and cfg.train_disc_against_ema
    assert cfg.optimizer == "adamax"
    assert cfg.nr_gen_per_disc == 3
    assert cfg.learning_rate_disc == 0.001


def test_parse_args_nr_gpu_alias():
    cfg = parse_args(["--nr_gpu", "4"])
    assert cfg.num_devices == 4


def test_train_toy_two_epochs(tmp_path):
    from otgan_tpu.train import train

    cfg = TrainConfig(
        model="toy_mlp",
        batch_size=64,
        sinkhorn_lambda=50.0,
        nr_sinkhorn_iter=5,
        max_epochs=2,
        save_every_epochs=2,
        save_dir=str(tmp_path),
        use_pallas=False,
    )
    state = train(cfg)
    assert int(np.asarray(state.step)) > 0
    # artifacts: metrics JSONL with per-epoch records
    recs = [json.loads(l) for l in open(os.path.join(tmp_path, "metrics.jsonl"))]
    epochs = [r for r in recs if "epoch" in r]
    assert len(epochs) == 2
    assert np.isfinite(epochs[-1]["dist_gen"])
    # toy sample dumps (npy, not png)
    assert os.path.exists(os.path.join(tmp_path, "sample0.npy"))
    assert os.path.exists(os.path.join(tmp_path, "ema_sample1.npy"))
    # checkpoint written at epoch 2 boundary
    from otgan_tpu.utils.checkpoint import latest_checkpoint

    assert latest_checkpoint(str(tmp_path)) is not None


def test_train_resume(tmp_path):
    from otgan_tpu.train import train

    kw = dict(
        model="toy_mlp",
        batch_size=64,
        sinkhorn_lambda=50.0,
        nr_sinkhorn_iter=5,
        save_dir=str(tmp_path),
        use_pallas=False,
        save_every_epochs=2,
    )
    train(TrainConfig(max_epochs=2, **kw))
    state = train(TrainConfig(max_epochs=3, load_params=True, **kw))
    assert int(np.asarray(state.step)) > 0


def test_train_resume_orbax_backend(tmp_path):
    """--checkpoint_backend orbax: trainer saves via orbax, resumes exactly
    from the step directory through the unified latest/restore surface."""
    from otgan_tpu.train import train
    from otgan_tpu.utils.checkpoint import latest_checkpoint

    kw = dict(
        model="toy_mlp",
        batch_size=64,
        sinkhorn_lambda=50.0,
        nr_sinkhorn_iter=5,
        save_dir=str(tmp_path),
        use_pallas=False,
        save_every_epochs=2,
        checkpoint_backend="orbax",
    )
    first = train(TrainConfig(max_epochs=2, **kw))
    steps_per_epoch = int(np.asarray(first.step)) // 2
    ckpt = latest_checkpoint(str(tmp_path))
    assert ckpt is not None and os.path.isdir(ckpt)
    assert os.path.basename(ckpt) == "1"  # epoch index at the save boundary
    state = train(TrainConfig(max_epochs=3, load_params=True, **kw))
    # epochs 0-1 ran in the first call, the resumed call runs exactly epoch 2
    assert int(np.asarray(state.step)) == 3 * steps_per_epoch


def test_presets():
    cfg = parse_args(["--preset", "train_py"])
    assert cfg.batch_size == 5000 and cfg.nr_gen_per_disc == 5
    cfg = parse_args(["--preset", "model_saving"])
    assert cfg.batch_size == 8000 and cfg.nr_gen_per_disc == 3
    # explicit flags win over the preset
    cfg = parse_args(["--preset", "model_saving", "--batch_size", "256"])
    assert cfg.batch_size == 256 and cfg.nr_gen_per_disc == 3


def test_sample_cli(tmp_path):
    """Train a tiny toy run, then drive the sampling CLI from its checkpoint."""
    from otgan_tpu.train import train
    from otgan_tpu.sample import main as sample_main

    cfg = TrainConfig(
        model="toy_mlp",
        batch_size=64,
        sinkhorn_lambda=50.0,
        nr_sinkhorn_iter=5,
        max_epochs=2,
        save_every_epochs=2,
        save_dir=str(tmp_path),
        use_pallas=False,
        # the sampling CLI enables the cache dir persisted in config.json —
        # pin it to tmp so CI never writes the user-global cache
        compilation_cache_dir=str(tmp_path / "xla_cache"),
    )
    train(cfg)
    x = sample_main(
        [
            "--save_dir", str(tmp_path),
            "--model", "toy_mlp",
            "--batch_size", "64",
            "--num_samples", "100",
            "--ema",
        ]
    )
    assert x.shape == (100, 2)
    assert os.path.exists(os.path.join(tmp_path, "samples.npz"))


def test_preset_explicit_equals_form():
    cfg = parse_args(["--preset", "train_py", "--batch_size=2000"])
    assert cfg.batch_size == 2000  # --flag=value counts as explicit


def test_toy_mlp_defaults_to_relu():
    cfg = TrainConfig(model="toy_mlp")
    assert cfg.model_opts()["nonlinearity"] == "relu"
    cfg = TrainConfig(model="toy_mlp", nonlinearity="elu")
    assert cfg.model_opts()["nonlinearity"] == "elu"
    cfg = TrainConfig(model="dcgan")
    assert cfg.model_opts()["nonlinearity"] == "crelu"


def test_evaluate_cli(tmp_path, monkeypatch):
    """Train a tiny dcgan-shaped toy... dcgan is too heavy for CPU tests;
    use toy checkpoint + image-shaped override is not possible, so exercise
    the evaluate CLI wiring with a toy checkpoint and a stubbed scorer."""
    from otgan_tpu.train import train
    from otgan_tpu import evaluate as ev

    cfg = TrainConfig(
        model="toy_mlp",
        batch_size=64,
        sinkhorn_lambda=50.0,
        nr_sinkhorn_iter=5,
        max_epochs=2,
        save_every_epochs=2,
        save_dir=str(tmp_path),
        use_pallas=False,
        # the evaluate CLI enables the cache dir persisted in config.json —
        # pin it to tmp so CI never writes the user-global cache
        compilation_cache_dir=str(tmp_path / "xla_cache"),
    )
    train(cfg)

    import otgan_tpu.eval.inception as inc

    def fake_score(images, splits=10):
        # toy generator output is unbounded 2-D points; just record the call
        assert images.shape[0] == 128 and splits == 2
        return 5.5, 0.25

    monkeypatch.setattr(inc, "get_inception_score", fake_score)
    res = ev.main(
        [
            "--save_dir", str(tmp_path),
            "--model", "toy_mlp",
            "--batch_size", "64",
            "--num_samples", "128",
            "--splits", "2",
        ]
    )
    assert res["inception_score"] == 5.5 and res["num_samples"] == 128

    # --fid_stats_path: FID against precomputed statistics, no raw data
    # access (features stubbed — the toy generator emits 2-D points)
    import otgan_tpu.eval.fid as fid_mod

    monkeypatch.setattr(inc, "_variant_cache", "torchvision")
    monkeypatch.setattr(
        fid_mod,
        "pool_features",
        lambda imgs, **kw: np.random.default_rng(0).normal(
            size=(imgs.shape[0], 4)
        ),
    )
    stats_p = str(tmp_path / "ref_stats.npz")
    fid_mod.save_reference_statistics(
        stats_p, np.zeros(4), np.eye(4), "torchvision", 100
    )
    res2 = ev.main(
        [
            "--save_dir", str(tmp_path),
            "--model", "toy_mlp",
            "--batch_size", "64",
            "--num_samples", "128",
            "--splits", "2",
            "--fid_stats_path", stats_p,
            "--fid_samples", "64",
        ]
    )
    assert "fid" in res2 and np.isfinite(res2["fid"]) and res2["fid"] >= 0.0


@pytest.mark.slow  # ~100 s cold on the 1-core host (fresh DenseNet train()
# compile); the prefix logic itself is a one-liner exercised by every
# init_batch_size drive in the verify recipe and by bench's stubbed
# test (tests/test_bench.py::test_time_cycles_inits_on_prefix)
def test_train_with_smaller_init_batch(tmp_path):
    """--init_batch_size runs the data-dependent init pass on a prefix of
    the batch (the init forward has no remat and OOMs before training does
    on deep families, REHEARSAL.md); training then proceeds at full batch."""
    from otgan_tpu.train import train

    cfg = TrainConfig(
        model="densenet",  # the family whose init pass OOMs first
        layers_per_block=2,
        filters_per_layer=8,
        synthetic_data=True,
        synthetic_size=32,
        batch_size=16,
        init_batch_size=8,
        nr_sinkhorn_iter=5,
        sinkhorn_lambda=50.0,
        max_epochs=1,
        save_every_epochs=100,
        save_dir=str(tmp_path),
        use_pallas=False,
    )
    state = train(cfg)
    assert int(np.asarray(state.step)) == 2  # 32/16 steps at FULL batch
    recs = [json.loads(l) for l in open(os.path.join(tmp_path, "metrics.jsonl"))]
    assert np.isfinite([r for r in recs if "epoch" in r][-1]["dist_gen"])


def test_inception_batch_flag():
    cfg = parse_args(["--inception_batch", "500"])
    assert cfg.inception_batch == 500
    assert parse_args([]).inception_batch == 0  # module default preserved


def test_host_prefetch_bit_identical(tmp_path, monkeypatch):
    """--host_prefetch (round 4: depth-1 placement prefetcher overlapping
    the next cycle's H2D with the current cycle's execution) is a pure
    scheduling change — per-step metrics must be bit-identical to the
    inline placement path, across epoch boundaries, the fused cycle, and
    a leftover partial cycle (6 batches / period 3 / 2 epochs)."""
    from otgan_tpu.train import train

    monkeypatch.setenv("OTGAN_TOY_EPOCH_BATCHES", "7")  # 2 cycles + partial

    def run(prefetch: bool, where):
        cfg = TrainConfig(
            model="toy_mlp",
            batch_size=64,
            nr_sinkhorn_iter=5,
            sinkhorn_lambda=50.0,
            nr_gen_per_disc=2,
            max_epochs=2,
            save_every_epochs=100,
            save_dir=str(where),
            use_pallas=False,
            host_prefetch=prefetch,
            log_every_steps=1,
        )
        train(cfg)
        return [
            json.loads(l)
            for l in open(os.path.join(where, "metrics.jsonl"))
        ]

    on = run(True, tmp_path / "on")
    off = run(False, tmp_path / "off")
    key = lambda recs: [
        (r["step"], r.get("dist"), r.get("entropy"), r.get("dist_gen"))
        for r in recs
        if "dist" in r or "dist_gen" in r
    ]
    assert key(on) == key(off)
    assert len(key(on)) >= 6  # steps and epochs both logged


@pytest.mark.slow  # ~101 s cold on the 1-core host; the eval-in-train
# protocol keeps a fast-tier guard (test_fid_eval_in_train + the
# host-reduce/golden-pin eval tests)
def test_inception_eval_running_max_in_train(tmp_path, monkeypatch):
    """The reference tracks ONE running max over raw+EMA scores across
    evals (train.py:264-272); train() must log max_inception_score with
    the epoch it occurred at. Inception weights monkeypatched to tiny
    random params (zero-egress env), classifier batch shrunk."""
    from otgan_tpu.train import train
    import otgan_tpu.eval.inception as inc
    from otgan_tpu.eval import inception_net

    monkeypatch.setattr(
        inc,
        "_params_cache",
        inception_net.init_params(np.random.default_rng(0), num_classes=8),
    )
    monkeypatch.setattr(inc, "_variant_cache", "torchvision")
    monkeypatch.setattr(inc, "_BATCH", 2)

    cfg = TrainConfig(
        model="densenet",
        layers_per_block=1,
        filters_per_layer=4,
        synthetic_data=True,
        synthetic_size=16,
        batch_size=8,
        sinkhorn_lambda=50.0,
        nr_sinkhorn_iter=5,
        max_epochs=2,
        eval_every_epochs=2,  # fires at epoch 1
        inception_samples=4,
        inception_splits=2,
        save_every_epochs=100,
        save_dir=str(tmp_path),
        use_pallas=False,
    )
    train(cfg)
    recs = [json.loads(l) for l in open(os.path.join(tmp_path, "metrics.jsonl"))]
    raw = [r for r in recs if "inception_score" in r]
    ema = [r for r in recs if "ema_inception_score" in r]
    mx = [r for r in recs if "max_inception_score" in r]
    assert len(raw) == 1 and len(ema) == 1 and len(mx) == 1
    assert mx[0]["max_inception_score"] == max(
        raw[0]["inception_score"], ema[0]["ema_inception_score"]
    )
    assert mx[0]["max_inception_epoch"] == 1


def test_fid_eval_in_train(tmp_path, monkeypatch):
    """--eval_fid: the eval event computes real-data reference statistics
    once (cached to <save_dir>/fid_stats.npz), switches to the one-pass
    combined scorer, and logs raw+EMA FID alongside the Inception score."""
    from otgan_tpu.train import train
    import otgan_tpu.eval.inception as inc
    import otgan_tpu.eval.fid as fid_mod
    from otgan_tpu.eval import inception_net

    monkeypatch.setattr(
        inc,
        "_params_cache",
        inception_net.init_params(np.random.default_rng(0), num_classes=8),
    )
    monkeypatch.setattr(inc, "_variant_cache", "torchvision")
    monkeypatch.setattr(inc, "_BATCH", 2)
    monkeypatch.setattr(fid_mod, "_BATCH", 2)

    cfg = TrainConfig(
        model="densenet",  # tiny — the full DCGAN takes minutes/step on CPU
        layers_per_block=1,
        filters_per_layer=4,
        synthetic_data=True,
        synthetic_size=16,
        batch_size=8,
        sinkhorn_lambda=50.0,
        nr_sinkhorn_iter=5,
        max_epochs=2,
        eval_every_epochs=2,
        inception_samples=4,
        inception_splits=2,
        eval_fid=True,
        save_every_epochs=100,
        save_dir=str(tmp_path),
        use_pallas=False,
    )
    train(cfg)
    stats_path = os.path.join(str(tmp_path), "fid_stats.npz")
    assert os.path.exists(stats_path), "reference statistics not cached"
    mu, sigma = fid_mod.load_reference_statistics(
        stats_path, expect_variant="torchvision"
    )
    assert mu.shape == (2048,) and sigma.shape == (2048, 2048)
    recs = [json.loads(l) for l in open(os.path.join(tmp_path, "metrics.jsonl"))]
    fids = [r for r in recs if "fid" in r]
    ema_fids = [r for r in recs if "ema_fid" in r]
    scores = [r for r in recs if "inception_score" in r]
    assert len(fids) == 1 and len(ema_fids) == 1 and len(scores) == 1
    assert np.isfinite(fids[0]["fid"]) and fids[0]["fid"] >= 0.0
    assert np.isfinite(ema_fids[0]["ema_fid"])


def test_eval_fid_host_reduce_protocol(tmp_path, monkeypatch):
    """OTGAN_EVAL_DEVICE_REDUCE=0 with --eval_fid: the pinned host-f64 IS
    protocol must be respected (the combined device-reduce scorer is
    bypassed; two separate passes) and FID must still be logged."""
    from otgan_tpu import train as train_mod
    import otgan_tpu.eval.inception as inc
    from otgan_tpu.eval import inception_net
    import jax as _jax

    monkeypatch.setenv("OTGAN_EVAL_DEVICE_REDUCE", "0")
    monkeypatch.setattr(
        inc,
        "_params_cache",
        inception_net.init_params(np.random.default_rng(0), num_classes=6),
    )
    monkeypatch.setattr(inc, "_variant_cache", "torchvision")
    monkeypatch.setattr(inc, "_BATCH", 2)

    # the combined scorer must NOT run on this protocol
    import otgan_tpu.eval.fid as fid_mod

    def _boom(*a, **kw):
        raise AssertionError("combined scorer ran under host-reduce protocol")

    monkeypatch.setattr(fid_mod, "combined_eval_from_sampler", _boom)

    class _Eng:
        def sample(self, state, key, batch, ema):
            return _jax.random.uniform(
                key, (4, 16, 16, 3), minval=-1.0, maxval=1.0
            )

    class _Log:
        def __init__(self):
            self.recs = []

        def log(self, step, **kw):
            self.recs.append(kw)

    class _Loader:
        def images_255(self, limit=None):
            return np.random.default_rng(1).integers(
                0, 256, (8, 16, 16, 3)
            ).astype(np.float32)

    cfg = TrainConfig(
        eval_fid=True,
        inception_samples=4,
        inception_splits=2,
        batch_size=4,
        save_dir=str(tmp_path),
    )
    log = _Log()
    train_mod._maybe_inception_eval(
        cfg, _Eng(), None, log, 0, loader=_Loader(), is_chief=True
    )
    keys = set().union(*[set(r) for r in log.recs])
    assert {
        "fid", "ema_fid", "inception_score", "ema_inception_score"
    } <= keys
    fid_vals = [r["fid"] for r in log.recs if "fid" in r]
    assert np.isfinite(fid_vals[0]) and fid_vals[0] >= 0.0


def test_fid_stats_path_never_clobbered(tmp_path, monkeypatch):
    """An EXPLICIT --fid_stats_path that cannot be used (wrong weight
    variant, foreign archive without our keys) disables FID for the run
    and leaves the file byte-identical — it must never be overwritten by
    shard-local statistics. The decision is memoized per path."""
    from otgan_tpu import train as train_mod
    from otgan_tpu.eval import fid as fid_mod
    import otgan_tpu.eval.inception as inc

    monkeypatch.setattr(inc, "_variant_cache", "torchvision")

    # (a) variant mismatch
    p = str(tmp_path / "stats.npz")
    fid_mod.save_reference_statistics(
        p, np.zeros(4), np.eye(4), "tf2015", 7
    )
    before = open(p, "rb").read()
    cfg = TrainConfig(fid_stats_path=p, save_dir=str(tmp_path))
    assert train_mod._fid_reference_stats(cfg, loader=None, is_chief=True) is None
    assert open(p, "rb").read() == before
    assert train_mod._fid_reference_stats(cfg, None, True) is None  # memo

    # (b) foreign npz (mu/sigma only, no variant key) -> KeyError inside
    # load_reference_statistics must not propagate or clobber
    p2 = str(tmp_path / "foreign.npz")
    np.savez(p2, mu=np.zeros(4), sigma=np.eye(4))
    before2 = open(p2, "rb").read()
    cfg2 = TrainConfig(fid_stats_path=p2, save_dir=str(tmp_path))
    assert train_mod._fid_reference_stats(cfg2, loader=None, is_chief=True) is None
    assert open(p2, "rb").read() == before2


def test_train_resume_with_padded_halves_matcher(tmp_path):
    """Full driver E2E on the padded-halves row-sharded path (batch 40 on
    the 8-device mesh: half 20, 20 % 8 != 0) incl. exact save/resume — the
    driver-level guard for the round-3 uneven-batch machinery."""
    from otgan_tpu.train import train

    kw = dict(
        model="toy_mlp",
        batch_size=40,
        sinkhorn_lambda=50.0,
        nr_sinkhorn_iter=5,
        save_dir=str(tmp_path),
        use_pallas=False,
        save_every_epochs=2,
        matching_layout="rows",  # pin: this test guards the padded path
    )
    train(TrainConfig(max_epochs=2, **kw))
    recs = [json.loads(l) for l in open(os.path.join(tmp_path, "metrics.jsonl"))]
    matcher = [r for r in recs if "matcher" in r]
    assert matcher and "padded halves" in matcher[0]["matcher"]
    epochs = [r for r in recs if "epoch" in r]
    assert np.isfinite(epochs[-1]["dist_gen"])
    state = train(TrainConfig(max_epochs=3, load_params=True, **kw))
    assert int(np.asarray(state.step)) > 0


def test_launch_validation_rejects_missing_fid_stats_and_bad_batch(tmp_path):
    """Launch-time guards (round-3 review): an explicit --fid_stats_path
    that doesn't exist is almost always a typo — raising beats silently
    computing shard-local statistics and writing them THERE; a negative
    --inception_batch would otherwise surface only at the first eval
    event as a silent IS=1.0 / NaN FID."""
    import pytest

    from otgan_tpu import train as train_mod

    cfg = TrainConfig(
        model="toy_mlp", batch_size=16, save_dir=str(tmp_path),
        eval_fid=True, fid_stats_path=str(tmp_path / "nope.npz"),
    )
    with pytest.raises(FileNotFoundError, match="fid_stats_path"):
        train_mod.train(cfg)

    cfg2 = TrainConfig(
        model="toy_mlp", batch_size=16, save_dir=str(tmp_path),
        inception_batch=-100,
    )
    with pytest.raises(ValueError, match="inception_batch"):
        train_mod.train(cfg2)


def test_fid_reference_stats_disabled_when_user_path_vanishes(tmp_path):
    """Mid-run defense for the same case: the file existed at launch but
    vanished before the first eval — disable FID, never write the path."""
    from otgan_tpu import train as train_mod

    p = str(tmp_path / "gone.npz")
    cfg = TrainConfig(fid_stats_path=p, save_dir=str(tmp_path))
    assert train_mod._fid_reference_stats(cfg, loader=None, is_chief=True) is None
    assert not os.path.exists(p)


def test_stream_chunks_rejects_nonpositive_batch():
    import pytest

    from otgan_tpu.eval.inception import _stream_chunks

    with pytest.raises(ValueError, match="must be >= 1"):
        next(_stream_chunks(lambda s: None, 10, 0))
    with pytest.raises(ValueError, match="must be >= 1"):
        next(_stream_chunks(lambda s: None, 10, -100))


def test_fid_cli_rejects_normalized_image_stack(tmp_path):
    """A [0,1]-normalized float stack into the offline stats CLI must be
    rejected, not scored as near-black [0,255] images."""
    import pytest

    from otgan_tpu.eval import fid as fid_mod

    p = str(tmp_path / "norm.npy")
    np.save(p, np.random.default_rng(0).uniform(0, 1, (8, 32, 32, 3)))
    with pytest.raises(ValueError, match="uint8-range"):
        fid_mod.main(["--images", p, "--out", str(tmp_path / "o.npz")])


def test_short_epochs_never_log_nan_metrics(tmp_path, monkeypatch):
    """Epochs too short to contain a D step (the 2-step-epoch bench/
    rehearsal shape with the 5:1 schedule) must not log nan means into
    metrics.jsonl or distances.npz: the last observed epoch mean is
    carried forward, flagged ``dist_disc_carried`` (VERDICT r04 weak #3;
    reference per-epoch reporting: train.py:229-231,277)."""
    from otgan_tpu.train import train

    monkeypatch.setenv("OTGAN_TOY_EPOCH_BATCHES", "2")  # 2 steps per epoch
    cfg = TrainConfig(
        model="toy_mlp",
        batch_size=64,
        sinkhorn_lambda=50.0,
        nr_sinkhorn_iter=5,
        nr_gen_per_disc=5,  # D at steps 0, 6, ... -> epochs 1-2 are G-only
        max_epochs=4,
        save_every_epochs=4,
        save_dir=str(tmp_path),
        use_pallas=False,
    )
    train(cfg)
    recs = [json.loads(l) for l in open(os.path.join(tmp_path, "metrics.jsonl"))]
    epochs = [r for r in recs if "epoch" in r]
    assert len(epochs) == 4
    for r in recs:  # NO record anywhere carries a nan
        for k, v in r.items():
            if isinstance(v, float):
                assert np.isfinite(v), (k, r)
    # epoch 0 has the real D step; epochs 1-2 carry it forward, flagged
    assert "dist_disc_carried" not in epochs[0]
    for r in epochs[1:3]:
        assert r["dist_disc_carried"] is True
        assert r["dist_disc"] == epochs[0]["dist_disc"]
    # epoch 3 has a fresh D step (step 6): flag gone, value its own
    assert "dist_disc_carried" not in epochs[3]
    # the loss-history artifact is per-epoch aligned and NaN-free
    hist = np.load(os.path.join(tmp_path, "distances.npz"))
    assert hist["mean_dist_gen"].shape == (4,)
    assert hist["mean_dist_disc"].shape == (4,)
    assert np.isfinite(hist["mean_dist_gen"]).all()
    assert np.isfinite(hist["mean_dist_disc"]).all()
