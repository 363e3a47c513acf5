"""Tensor parallelism == single-device forward (parallel/tensor.py).

The TP forward shards weights over a model axis and must reproduce the
plain forward bit-for-tolerance (fp32, psum reassociation only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cleanumamba_tpu.config import CleanUMambaConfig
from cleanumamba_tpu.models.cleanumamba import forward, init_params
from cleanumamba_tpu.parallel.tensor import tp_forward, tp_prepare

TINY = dict(
    channels_H=8,
    max_H=16,
    encoder_n_layers=4,
    tsfm_n_layers=2,
    tsfm_n_head=2,
    tsfm_d_model=16,
    tsfm_d_inner=32,
    normalize_input=False,
)


def _mesh(shape, names):
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12)


@pytest.mark.slow
@pytest.mark.parametrize("n", [2, 4])
@pytest.mark.parametrize("bypass,normalize", [(0, False), (4, True)])
def test_tp_forward_matches(n, bypass, normalize):
    cfg = CleanUMambaConfig(**{**TINY, "bypass_channels": bypass,
                               "normalize_input": normalize})
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 801)), jnp.float32)
    ref = forward(params, x, cfg, scan_impl="xla")
    mesh = _mesh((n,), ("model",))
    got = tp_forward(params, x, cfg, mesh, scan_impl="xla")
    assert got.shape == ref.shape
    assert _rel(got, ref) < 2e-5


@pytest.mark.slow
@pytest.mark.parametrize("n", [2, 4])
def test_tp_forward_matches_mamba2(n):
    """mamba2 (SSD) TP: heads + d_inner shard over the model axis, B/C
    replicated; must equal the plain forward."""
    cfg = CleanUMambaConfig(**{**TINY, "bottleneck": "mamba2"})
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 801)), jnp.float32)
    ref = forward(params, x, cfg)
    mesh = _mesh((n,), ("model",))
    got = tp_forward(params, x, cfg, mesh, scan_impl="xla")
    assert got.shape == ref.shape
    assert _rel(got, ref) < 2e-5


@pytest.mark.slow
def test_tp_forward_pallas_interpret_branch():
    """The scan_impl='pallas' branch of _tp_mixer_forward, executed via
    Pallas interpret mode on the CPU mesh (covers the TPU code path the
    CPU-only suite would otherwise never run), values AND gradients."""
    cfg = CleanUMambaConfig(**TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 801)), jnp.float32)
    ref = forward(params, x, cfg, scan_impl="xla")
    mesh = _mesh((2,), ("model",))
    got = tp_forward(params, x, cfg, mesh, scan_impl="pallas_interpret")
    assert _rel(got, ref) < 2e-4

    def loss_ref(p):
        return jnp.sum(jnp.square(forward(p, x, cfg, scan_impl="xla")))

    def loss_tp(p):
        return jnp.sum(jnp.square(
            tp_forward(p, x, cfg, mesh, scan_impl="pallas_interpret")))

    g_ref = jax.grad(loss_ref)(params)
    g_tp = jax.grad(loss_tp)(params)
    worst = max(_rel(t, r) for t, r in zip(jax.tree_util.tree_leaves(g_tp),
                                           jax.tree_util.tree_leaves(g_ref)))
    assert worst < 5e-3, worst


@pytest.mark.slow
@pytest.mark.parametrize("n", [2, 4])
def test_tp_forward_matches_mha(n):
    """MHA ("CleanUNet") TP: Q/K/V column-parallel over heads, fc and
    ffn_w2 row-parallel; must equal the plain forward.  n_head must divide
    the mesh (4 heads here so n=4 holds whole heads per device)."""
    cfg = CleanUMambaConfig(**{**TINY, "bottleneck": "mha", "tsfm_n_head": 4})
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 801)), jnp.float32)
    ref = forward(params, x, cfg)
    mesh = _mesh((n,), ("model",))
    got = tp_forward(params, x, cfg, mesh)
    assert got.shape == ref.shape
    assert _rel(got, ref) < 2e-5


@pytest.mark.slow
@pytest.mark.parametrize("n", [2, 4])
def test_tp_forward_matches_s4(n):
    """MambaS4 TP: d_inner shards (x|z and GLU [A|B] interleaves), the S4
    long convolution replicates on the tiny H; must equal the plain
    forward."""
    from cleanumamba_tpu.models.cleanumamba import prepare_for_length
    cfg = CleanUMambaConfig(**{**TINY, "bottleneck": "mamba_s4"})
    params = init_params(jax.random.PRNGKey(0), cfg)
    params = prepare_for_length(params, cfg, 801)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 801)), jnp.float32)
    ref = forward(params, x, cfg)
    mesh = _mesh((n,), ("model",))
    got = tp_forward(params, x, cfg, mesh, scan_impl="xla")
    assert got.shape == ref.shape
    assert _rel(got, ref) < 2e-5


def test_tp_param_memory_shards():
    """The big leaves really are sharded: local slice = 1/n of the global."""
    cfg = CleanUMambaConfig(**TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    params_tp, specs = tp_prepare(params, cfg, 4)
    mx = specs["bottleneck"]["layers"][0]["mixer"]
    assert mx["in_proj"] == jax.sharding.PartitionSpec(None, "model")
    assert mx["out_proj"] == jax.sharding.PartitionSpec("model", None)
    # every sharded dim divisible by 4
    def chk(p, s):
        for ax, name in enumerate(s):
            if name is not None:
                assert p.shape[ax] % 4 == 0
    jax.tree_util.tree_map(chk, params_tp, specs,
                           is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))


@pytest.mark.slow
def test_tp_dp_compose():
    """2-D mesh: batch over 'data' x weights over 'model'."""
    cfg = CleanUMambaConfig(**TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 801)), jnp.float32)
    ref = forward(params, x, cfg, scan_impl="xla")
    mesh = _mesh((2, 4), ("data", "model"))
    got = tp_forward(params, x, cfg, mesh, data_axis="data", scan_impl="xla")
    assert _rel(got, ref) < 2e-5


def test_tp_rejects_indivisible():
    cfg = CleanUMambaConfig(**TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="not divisible"):
        tp_prepare(params, cfg, 3)


def test_tp_rejects_non_mamba():
    cfg = CleanUMambaConfig(**{**TINY, "bottleneck": "lstm"})
    params = init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(NotImplementedError):
        tp_prepare(params, cfg, 2)


def _train_setup(bottleneck="mamba"):
    from cleanumamba_tpu.config import (LossConfig, OptimizationConfig,
                                        STFTLossConfig)
    kw = {**TINY, "bottleneck": bottleneck}
    if bottleneck == "mha":
        kw["tsfm_n_head"] = 4  # whole heads per device on the 4-way mesh
    cfg = CleanUMambaConfig(**kw)
    loss_cfg = LossConfig(stft_config=STFTLossConfig(
        fft_sizes=(64,), hop_sizes=(16,), win_lengths=(32,)))
    opt_cfg = OptimizationConfig(n_iters=100, bf16=False,
                                 clip_grad_norm_max=10.0)
    params = init_params(jax.random.PRNGKey(3), cfg)
    if bottleneck == "mamba_s4":
        from cleanumamba_tpu.models.cleanumamba import prepare_for_length
        params = prepare_for_length(params, cfg, 801)
    rng = np.random.default_rng(7)
    clean = jnp.asarray(rng.normal(size=(4, 801)).astype(np.float32) * 0.3)
    noisy = clean + 0.1 * jnp.asarray(
        rng.normal(size=(4, 801)).astype(np.float32))
    return cfg, loss_cfg, opt_cfg, params, clean, noisy


def _ref_steps(cfg, loss_cfg, opt_cfg, params, clean, noisy, n_steps):
    from cleanumamba_tpu.train.trainer import make_optimizer, make_train_step
    optimizer = make_optimizer(opt_cfg)
    step = make_train_step(cfg, loss_cfg, optimizer, bf16=False)
    opt_state = optimizer.init(params)
    aux = None
    for _ in range(n_steps):
        params, opt_state, aux = step(params, opt_state,
                                      (clean[None], noisy[None]))
    return params, aux


@pytest.mark.slow
def test_tp_grads_match_single_device():
    """The TP backward is EXACT: per-leaf gradients through the shard_map'd
    forward (tp_prepare is inside tp_forward and differentiable, so grads
    come back in canonical layout) match the plain forward's at fp32
    reassociation noise.  This pins the gradient math itself — the psum
    transposes, the replicated-leaf partial-grad structure — independent of
    any optimizer."""
    from cleanumamba_tpu.losses import loss_fn
    cfg, loss_cfg, _, params, clean, noisy = _train_setup()
    mesh = _mesh((4,), ("model",))

    def ref_loss(p):
        return loss_fn(forward(p, noisy, cfg, scan_impl="xla"),
                       clean, loss_cfg)[0]

    def tp_loss(p):
        return loss_fn(tp_forward(p, noisy, cfg, mesh, scan_impl="xla"),
                       clean, loss_cfg)[0]

    l_ref, g_ref = jax.value_and_grad(ref_loss)(params)
    l_tp, g_tp = jax.value_and_grad(tp_loss)(params)
    assert abs(float(l_ref) - float(l_tp)) < 1e-5
    worst = max(_rel(t, r) for t, r in zip(jax.tree_util.tree_leaves(g_tp),
                                           jax.tree_util.tree_leaves(g_ref)))
    assert worst < 1e-4, worst


@pytest.mark.parametrize("data_axis,bottleneck",
                         [(None, "mamba"), ("data", "mamba"),
                          (None, "mamba2"), ("data", "mamba2"),
                          (None, "mha"), (None, "mamba_s4")])
@pytest.mark.slow
def test_tp_train_step_matches_single_device(data_axis, bottleneck):
    """TP (and DP x TP) training == the single-device step: same params
    after 2 updates (pins the replicated-grad psum, the psum(loss)/n
    seeding, and the TP-aware global-norm clip).

    Param tolerance is 2e-3, looser than the 1e-4-level gradient agreement
    (test_tp_grads_match_single_device), because Adam amplifies noise:
    elements whose true gradient is at fp32-reassociation noise level
    (~1e-5 relative, e.g. dt_proj with |g|~1e-7) can flip sign between the
    two computations, and Adam's step-1 update is +-lr regardless of
    gradient magnitude — so those elements diverge by up to 2*lr per step.
    Loss and grad-norm stay tight."""
    from cleanumamba_tpu.parallel.tensor import make_tp_train_step, tp_unprepare
    cfg, loss_cfg, opt_cfg, params, clean, noisy = _train_setup(bottleneck)
    ref_params, ref_aux = _ref_steps(cfg, loss_cfg, opt_cfg, params,
                                     clean, noisy, 2)

    if data_axis:
        mesh = _mesh((2, 4), ("data", "model"))
    else:
        mesh = _mesh((4,), ("model",))
    make = make_tp_train_step(cfg, loss_cfg, opt_cfg, mesh,
                              data_axis=data_axis, bf16=False)
    p_tp, opt_state, step = make(params)
    aux = None
    for _ in range(2):
        p_tp, opt_state, aux = step(p_tp, opt_state,
                                    (clean[None], noisy[None]))
    got = tp_unprepare(jax.device_get(p_tp), cfg, 4)

    flat_ref = jax.tree_util.tree_leaves(ref_params)
    flat_got = jax.tree_util.tree_leaves(got)
    worst = max(_rel(g, r) for g, r in zip(flat_got, flat_ref))
    assert worst < 2e-3, worst
    assert abs(float(aux["loss"]) - float(ref_aux["loss"])) < 1e-4
    assert _rel(float(aux["grad_norm"]), float(ref_aux["grad_norm"])) < 1e-4


@pytest.mark.slow
def test_tp_train_step_grad_accum_matches_dp_step():
    """accum=2 under TP == the single-device step fed the SAME (2, B, L)
    microbatch stack (pins the lax.scan accumulation semantics against
    make_train_step's — reference batch_size_total, train.py:232-299)."""
    from cleanumamba_tpu.parallel.tensor import make_tp_train_step, tp_unprepare
    cfg, loss_cfg, opt_cfg, params, clean, noisy = _train_setup()
    stack = (clean.reshape(2, 2, -1), noisy.reshape(2, 2, -1))
    from cleanumamba_tpu.train.trainer import make_optimizer, make_train_step
    optimizer = make_optimizer(opt_cfg)
    ref_step = make_train_step(cfg, loss_cfg, optimizer, bf16=False)
    ref_params, _, ref_aux = ref_step(params, optimizer.init(params), stack)

    mesh = _mesh((4,), ("model",))
    make = make_tp_train_step(cfg, loss_cfg, opt_cfg, mesh, bf16=False)
    p_tp, opt_state, step = make(params)
    p_tp, opt_state, aux = step(p_tp, opt_state, stack)
    got = tp_unprepare(jax.device_get(p_tp), cfg, 4)
    worst = max(_rel(g, r) for g, r in zip(jax.tree_util.tree_leaves(got),
                                           jax.tree_util.tree_leaves(ref_params)))
    assert worst < 2e-3, worst
    assert abs(float(aux["loss"]) - float(ref_aux["loss"])) < 1e-4
    assert _rel(float(aux["grad_norm"]), float(ref_aux["grad_norm"])) < 1e-4


@pytest.mark.slow
def test_tp_train_step_remat_same_values():
    """remat=True is a memory/recompute trade only — the updated params must
    be bitwise-level identical to the non-remat step."""
    from cleanumamba_tpu.parallel.tensor import make_tp_train_step
    cfg, loss_cfg, opt_cfg, params, clean, noisy = _train_setup()
    mesh = _mesh((4,), ("model",))
    outs = []
    for remat in (False, True):
        make = make_tp_train_step(cfg, loss_cfg, opt_cfg, mesh, bf16=False,
                                  remat=remat)
        # the step donates its param/opt buffers; replicated leaves pass
        # through tp_prepare by reference, so feed a fresh copy per run
        p_tp, opt_state, step = make(
            jax.tree_util.tree_map(jnp.array, params))
        p_tp, _, aux = step(p_tp, opt_state, (clean[None], noisy[None]))
        outs.append((jax.device_get(p_tp), float(aux["loss"])))
    (p0, l0), (p1, l1) = outs
    assert l0 == pytest.approx(l1, abs=1e-7)
    worst = max(_rel(a, b) for a, b in zip(jax.tree_util.tree_leaves(p1),
                                           jax.tree_util.tree_leaves(p0)))
    assert worst < 1e-6, worst


def test_tp_opt_state_roundtrip_mamba2():
    """mamba2's TP layout RESTRUCTURES the mixer dict (split leaves), so the
    opt-state permute must use matching templates each direction; the round
    trip is exact."""
    from cleanumamba_tpu.config import OptimizationConfig
    from cleanumamba_tpu.parallel.tensor import (tp_opt_state_like,
                                                 tp_permute_like)
    from cleanumamba_tpu.train.trainer import make_optimizer

    cfg = CleanUMambaConfig(**{**TINY, "bottleneck": "mamba2"})
    params = init_params(jax.random.PRNGKey(5), cfg)
    opt = make_optimizer(OptimizationConfig(n_iters=10))
    state = opt.init(params)
    # non-trivial moments: graft the (random-valued) params into mu/nu
    pdef = jax.tree_util.tree_structure(params)
    is_pl = lambda x: jax.tree_util.tree_structure(x) == pdef  # noqa: E731
    state = jax.tree_util.tree_map(
        lambda x: params if is_pl(x) else x, state,
        is_leaf=lambda x: is_pl(x) if not isinstance(x, jnp.ndarray) else False)
    fwd = tp_opt_state_like(state, params, cfg, 2)
    params_tp_shape = tp_permute_like(params, cfg, 2)
    back = tp_opt_state_like(fwd, params_tp_shape, cfg, 2, inverse=True)
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(state)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_tp_opt_state_roundtrip():
    """Adam moments permute to TP layout and back exactly (the checkpoint
    bank/resume path of cli/train.py --model-parallel)."""
    from cleanumamba_tpu.config import OptimizationConfig
    from cleanumamba_tpu.parallel.tensor import tp_opt_state_like
    from cleanumamba_tpu.train.trainer import make_optimizer

    cfg = CleanUMambaConfig(**TINY)
    params = init_params(jax.random.PRNGKey(5), cfg)
    # non-trivial moments: random values in the params structure
    keys = iter(jax.random.split(jax.random.PRNGKey(6), 10_000))
    rand = jax.tree_util.tree_map(
        lambda x: jax.random.normal(next(keys), np.shape(x)), params)
    opt = make_optimizer(OptimizationConfig(n_iters=10))
    state = opt.init(params)
    # graft the random leaves into every params-structured subtree
    pdef = jax.tree_util.tree_structure(params)
    is_pl = lambda x: jax.tree_util.tree_structure(x) == pdef  # noqa: E731
    state = jax.tree_util.tree_map(
        lambda x: rand if is_pl(x) else x, state,
        is_leaf=lambda x: is_pl(x) if not isinstance(x, jnp.ndarray) else False)
    fwd = tp_opt_state_like(state, params, cfg, 4)
    back = tp_opt_state_like(fwd, params, cfg, 4, inverse=True)
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(state)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # and the permutation is not the identity on the interleaved leaves
    flat_f = jax.tree_util.tree_leaves(fwd)
    flat_s = jax.tree_util.tree_leaves(state)
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(flat_f, flat_s))


@pytest.mark.slow
def test_tp_cli_train_bank_resume(tmp_path):
    """cli/train.py --model-parallel end-to-end on the 8-device CPU mesh
    (TP=2 x DP=4): trains, banks a CANONICAL-layout checkpoint that the
    single-device forward can consume, and resumes from it."""
    import json as _json
    import os

    from cleanumamba_tpu.cli.train import main
    from cleanumamba_tpu.train.checkpoint import load_checkpoint

    exp = {
        "network": "CleanUMamba",
        "exp_path": "tp_cli",
        "network_config": {
            "channels_H": 8, "max_H": 16, "encoder_n_layers": 4,
            "tsfm_n_layers": 2, "tsfm_n_head": 2,
            "tsfm_d_model": 16, "tsfm_d_inner": 32,
        },
    }
    train = {
        "train_config": {
            "log": {"directory": str(tmp_path / "exp"), "ckpt_iter": "max",
                    "iters_per_ckpt": 4, "iters_per_valid": 100000},
            "optimization": {
                "n_iters": 100, "batch_size_total": 8,
                "batch_size_per_gpu": 1, "autocast": False,
                "learning_rate": 1e-3, "clip_grad_norm_max": 10,
            },
            "loss_config": {"stft_config": {
                "fft_sizes": [64], "hop_sizes": [16], "win_lengths": [32]}},
        },
        "trainset_config": {"crop_length_sec": 0.1, "sample_rate": 16000},
    }
    cpath = str(tmp_path / "config.json")
    epath = str(tmp_path / "exp.json")
    with open(cpath, "w") as f:
        _json.dump(train, f)
    with open(epath, "w") as f:
        _json.dump(exp, f)

    main(["-c", cpath, "-e", epath, "--synthetic", "--max-iters", "6",
          "--model-parallel", "2", "--log-every", "2"])
    ckpt_dir = os.path.join(str(tmp_path / "exp"), "tp_cli", "checkpoint")
    ck = load_checkpoint(os.path.join(ckpt_dir, "5.pkl"))
    cfg = ck["config"]
    # canonical layout: the single-device forward consumes it directly
    y = forward(jax.tree_util.tree_map(jnp.asarray, ck["params"]),
                jnp.zeros((1, 801), jnp.float32) + 0.1, cfg, scan_impl="xla")
    assert np.isfinite(np.asarray(y)).all()
    assert ck["opt_state"] is not None
    # resume continues from iter 6 and banks the final checkpoint
    main(["-c", cpath, "-e", epath, "--synthetic", "--max-iters", "8",
          "--model-parallel", "2", "--log-every", "2"])
    ck2 = load_checkpoint(os.path.join(ckpt_dir, "7.pkl"))
    moved = False
    for a, b in zip(jax.tree_util.tree_leaves(ck2["params"]),
                    jax.tree_util.tree_leaves(ck["params"])):
        assert np.shape(a) == np.shape(b)
        moved = moved or not np.array_equal(np.asarray(a), np.asarray(b))
    # the resumed run actually TRAINED from the banked state (it did not
    # silently reinitialize): params moved between iter 5 and iter 7, and
    # the iter-7 optimizer count reflects 8 total updates, not 2
    assert moved
    counts = [int(np.asarray(leaf)) for leaf in
              jax.tree_util.tree_leaves(ck2["opt_state"])
              if np.ndim(leaf) == 0 and np.issubdtype(
                  np.asarray(leaf).dtype, np.integer)]
    assert 8 in counts, counts
