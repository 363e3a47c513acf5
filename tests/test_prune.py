"""Pruning-framework tests (reference invariant: prune -> forward/backward
still work, training/pruning.py:230-247 and examples/using_pruning_groups.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleanumamba_tpu.config import CleanUMambaConfig, LossConfig, OptimizationConfig, STFTLossConfig
from cleanumamba_tpu.models.cleanumamba import count_params, forward, init_params
from cleanumamba_tpu.prune.groups import build_groups, get_path
from cleanumamba_tpu.prune.importance import (
    calc_importance,
    get_prune_channels,
    group_importances,
)
from cleanumamba_tpu.prune.pruner import apply_pruning, prune_tree

MINI = dict(channels_H=32, max_H=64, tsfm_n_head=4, tsfm_d_model=64, tsfm_d_inner=128)


@pytest.fixture(scope="module")
def setup():
    cfg = CleanUMambaConfig(**MINI)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.normal(size=(2, 4000)) * 0.3, jnp.float32)
    noisy = clean + 0.1 * jnp.asarray(rng.normal(size=(2, 4000)), jnp.float32)

    def loss(p):
        y = forward(p, noisy, cfg)
        return jnp.mean(jnp.abs(y - clean))

    grads = jax.jit(jax.grad(loss))(params)
    return cfg, params, grads, noisy


def test_group_graph_shape(setup):
    cfg, params, grads, noisy = setup
    groups = build_groups(params, cfg)
    D, N = cfg.encoder_n_layers, cfg.tsfm_n_layers
    assert len(groups) == 3 * D + 1 + 3 * N  # 24 + 1 + 9 = 34 (survey §3.2)
    names = {g.name for g in groups}
    assert "d_model" in names and "d_inner0" in names and "dt_rank2" in names


def test_importance_zero_channel(setup):
    """Zeroing one channel's weights must zero its 'weight' importance."""
    cfg, params, grads, noisy = setup
    groups = {g.name: g for g in build_groups(params, cfg)}
    g = groups["encode_down_3"]
    # zero channel 5 of encoder.3 conv output + mix input
    p2 = jax.tree_util.tree_map(lambda x: x, params)
    from cleanumamba_tpu.prune.groups import set_path

    cw = np.asarray(p2["encoder"][3]["conv_w"]).copy()
    cw[:, :, 5] = 0
    mw = np.asarray(p2["encoder"][3]["mix_w"]).copy()
    mw[:, 5, :] = 0
    p2 = set_path(p2, ("encoder", 3, "conv_w"), jnp.asarray(cw))
    p2 = set_path(p2, ("encoder", 3, "mix_w"), jnp.asarray(mw))
    imps = group_importances(p2, g)
    assert imps["weight"][5] == 0
    assert np.all(np.asarray(imps["weight"])[np.arange(len(imps["weight"])) != 5] > 0)


@pytest.mark.slow
def test_every_group_prunes_and_forward_runs(setup):
    cfg, params, grads, noisy = setup
    n0 = count_params(params)
    p = params
    g_names = [g.name for g in build_groups(params, cfg)]
    for name in g_names:
        groups = {g.name: g for g in build_groups(p, cfg)}
        g = groups[name]
        n_prune = min(2, g.n_channels - 2)
        if n_prune < 1:
            continue
        p, _, _ = apply_pruning(p, {name: list(range(n_prune))}, cfg)
    # all groups pruned; params decreased, forward fine
    assert count_params(p) < n0
    y = forward(p, noisy, cfg)
    assert np.isfinite(np.asarray(y)).all()
    # gradients still flow through the pruned model
    g2 = jax.grad(lambda pp: jnp.mean(forward(pp, noisy, cfg) ** 2))(p)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g2))


def test_head_grouped_pruning_consistency(setup):
    """Pruning channel c of a 2-head slice removes rows {c, n+c}, keeping the
    GLU pairing aligned (A half stays matched with its gate half)."""
    cfg, params, grads, noisy = setup
    groups = {g.name: g for g in build_groups(params, cfg)}
    g = groups["skip_conn_0"]
    mix_w = np.asarray(get_path(params, ("encoder", 0, "mix_w")))
    n = g.n_channels
    p2 = prune_tree(params, g, [3])
    mix_w2 = np.asarray(get_path(p2, ("encoder", 0, "mix_w")))
    assert mix_w2.shape[2] == mix_w.shape[2] - 2
    # row n+4 (gate half channel 4) moved to index (n-1) + 3 = old n+4 shifted by 1
    np.testing.assert_array_equal(mix_w2[:, :, n - 1 + 3], mix_w[:, :, n + 4])
    np.testing.assert_array_equal(mix_w2[:, :, 3], mix_w[:, :, 4])


def test_dt_rank_and_d_state_offsets(setup):
    """x_proj carries [dt_rank | B | C]: pruning dt_rank then d_state must
    hit the right columns (offsets recomputed between prunes)."""
    cfg, params, grads, noisy = setup
    mixer = params["bottleneck"]["layers"][0]["mixer"]
    dt_rank = mixer["dt_proj_w"].shape[0]
    d_state = (mixer["x_proj"].shape[1] - dt_rank) // 2
    p, _, _ = apply_pruning(
        params, {"dt_rank0": [0], "d_state0": [1, 2]}, cfg
    )
    m2 = p["bottleneck"]["layers"][0]["mixer"]
    assert m2["dt_proj_w"].shape[0] == dt_rank - 1
    assert m2["x_proj"].shape[1] == (dt_rank - 1) + 2 * (d_state - 2)
    assert m2["A_log"].shape[1] == d_state - 2
    y = forward(p, noisy, cfg)
    assert np.isfinite(np.asarray(y)).all()


def test_selection_rules(setup):
    cfg, params, grads, noisy = setup
    groups = build_groups(params, cfg)
    sel, pruned_params, imp_min = get_prune_channels(
        groups,
        params,
        grads,
        importance_metric="taylor_squared_individual*n_filters/n_parameters",
        n_prune_channels=24,
        min_channels_per_group=8,
    )
    assert pruned_params > 0
    by_name = {g.name: g for g in groups}
    total = 0
    for name, idxs in sel.items():
        g = by_name[name]
        assert len(idxs) <= g.n_channels - 8  # floor respected
        if name.startswith("d_inner"):
            assert len(idxs) % 8 == 0, (name, len(idxs))
        total += len(idxs)
    assert total > 0
    # applying the selection keeps the model runnable
    p, _, _ = apply_pruning(params, sel, cfg)
    y = forward(p, noisy, cfg)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_prune_with_optimizer_state(setup):
    cfg, params, grads, noisy = setup
    from cleanumamba_tpu.train.trainer import make_optimizer, make_train_step

    opt_cfg = OptimizationConfig(n_iters=100)
    optimizer = make_optimizer(opt_cfg, schedule=lambda s: 1e-4)
    opt_state = optimizer.init(params)
    # take one step so Adam moments are non-trivial
    loss_cfg = LossConfig(
        stft_config=STFTLossConfig(fft_sizes=(256,), hop_sizes=(64,), win_lengths=(128,))
    )
    step = jax.jit(make_train_step(cfg, loss_cfg, optimizer, bf16=False))
    clean = noisy  # placeholder pair
    params2, opt_state, _ = step(params, opt_state, (clean[None], noisy[None]))
    p, g, o = apply_pruning(
        params2, {"d_inner1": list(range(8)), "skip_conn_2": [0, 1]}, cfg,
        grads=grads, opt_state=opt_state,
    )
    # moments must mirror param shapes
    import optax

    def adam_state(s):
        for x in jax.tree_util.tree_leaves(s, is_leaf=lambda y: isinstance(y, optax.ScaleByAdamState)):
            if isinstance(x, optax.ScaleByAdamState):
                return x
        raise AssertionError

    st = adam_state(o)
    shapes_p = [x.shape for x in jax.tree_util.tree_leaves(p)]
    shapes_mu = [x.shape for x in jax.tree_util.tree_leaves(st.mu)]
    assert shapes_p == shapes_mu
    # and training continues after the prune
    step2 = jax.jit(make_train_step(cfg, loss_cfg, optimizer, bf16=False))
    clean_p = noisy
    p3, o3, aux = step2(p, o, (clean_p[None], noisy[None]))
    assert np.isfinite(float(aux["loss"]))


def test_calc_importance_expression():
    imps = {"a": np.array([1.0, 2.0]), "b": np.array([2.0, 4.0]), "n": 4.0}
    np.testing.assert_allclose(calc_importance(imps, "a*b/n"), [0.5, 2.0])
    np.testing.assert_allclose(calc_importance(imps, "a**2"), [1.0, 4.0])
    np.testing.assert_allclose(calc_importance(imps, "a+b-a"), [2.0, 4.0])


@pytest.mark.slow
def test_importance_loss_experiment_and_scatter(setup, tmp_path):
    """Port of the reference calibration harness (layerwise_calibration.py
    :161-276): per-group random-prune probes record loss change next to the
    importance metrics, rows land in the JSONL sink, and the scatter
    renders."""
    from cleanumamba_tpu.losses import loss_fn as _loss_fn
    from cleanumamba_tpu.config import LossConfig, STFTLossConfig
    from cleanumamba_tpu.models.cleanumamba import forward as _fwd
    from cleanumamba_tpu.prune.calibrate import (
        importance_loss_experiment,
        scatter_importance_loss,
    )
    from cleanumamba_tpu.utils import MetricsLogger, read_history

    cfg, params, grads, noisy = setup
    clean = noisy * 0.9
    lc = LossConfig(stft_config=STFTLossConfig(
        fft_sizes=(256,), hop_sizes=(64,), win_lengths=(128,)))

    def loss_sampler(p):
        return float(_loss_fn(_fwd(p, noisy, cfg), clean, lc)[0])

    groups = [g for g in build_groups(params, cfg)][:3]
    sink = MetricsLogger.for_run(str(tmp_path))
    rows = importance_loss_experiment(
        params, cfg, grads, groups, loss_sampler,
        sample_size=2, n_remove=2, sink=sink, verbose=False)
    sink.close()
    assert len(rows) == 6
    for r in rows:
        assert np.isfinite(r["loss_change"])
        assert r["weight_imp"] is not None and r["weight_imp"] > 0
        assert r["taylor_ind_imp"] is not None
    hist = read_history(str(tmp_path / "metrics.jsonl"))
    assert sum(1 for h in hist if h.get("_kind") == "calibration_experiment") == 6
    png = scatter_importance_loss(rows, out_path=str(tmp_path / "s.png"))
    import os
    assert os.path.getsize(png) > 1000


def test_banked_lifecycle_artifact():
    """The committed prune-lifecycle artifact (released 2M -> 473K via
    prune/driver.py, then 50k-iter finetune; docs/prune_lifecycle.md) loads
    through the normal checkpoint path, matches the params count recorded in
    docs/prune_lifecycle.json, and runs the forward — i.e. the ragged
    (pruned) geometry is a plain differently-shaped pytree the model
    consumes with no width metadata."""
    import json
    import os

    import jax.numpy as jnp

    from cleanumamba_tpu.models.cleanumamba import count_params, forward
    from cleanumamba_tpu.train.checkpoint import load_checkpoint

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "artifacts", "pruned_473k_finetuned.pkl")
    ck = load_checkpoint(path)
    params, cfg = ck["params"], ck["config"]
    scored = json.load(open(os.path.join(repo, "docs", "prune_lifecycle.json")))
    assert count_params(params) == scored["ours pruned+finetuned"]["params"]
    assert ck["iter"] == scored["ours pruned+finetuned"]["iter"]
    # ragged: every layer's pruned d_inner (in_proj columns / 2) sits below
    # the unpruned config's d_inner — the artifact really is channel-pruned
    d_inners = [np.shape(lp["mixer"]["in_proj"])[1] // 2
                for lp in params["bottleneck"]["layers"]]
    assert all(di < cfg.d_inner for di in d_inners), (d_inners, cfg.d_inner)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4001)) * 0.1,
                    jnp.float32)
    y = np.asarray(jax.jit(lambda p, v: forward(p, v, cfg))(params, x))
    assert y.shape == (1, 4001)
    assert np.isfinite(y).all()


def test_capstone_lifecycle_artifact():
    """The round-5 zero-reference-weights capstone artifact (2.07M trained
    from scratch on device-synthesized data -> 724K via prune/driver.py ->
    20k-iter finetune; docs/capstone_lifecycle.md) loads through the normal
    checkpoint path, matches the scored record, and runs the forward — the
    whole chain carries zero imported reference weights."""
    import json
    import os

    from cleanumamba_tpu.train.checkpoint import load_checkpoint

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ck = load_checkpoint(os.path.join(repo, "artifacts",
                                      "capstone_724k_scratch.pkl"))
    params, cfg = ck["params"], ck["config"]
    scored = json.load(open(os.path.join(repo, "docs",
                                         "capstone_lifecycle.json")))
    assert count_params(params) == scored["ours pruned+finetuned"]["params"]
    # ragged: pruned channel groups sit strictly below the init geometry
    # (configs/exp_mamba_2m.json: d_inner 512, channels_H 64)
    d_inners = [np.shape(lp["mixer"]["in_proj"])[1] // 2
                for lp in params["bottleneck"]["layers"]]
    assert all(di < 512 for di in d_inners), d_inners
    params = jax.tree_util.tree_map(jnp.asarray, params)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4001)) * 0.1,
                    jnp.float32)
    y = np.asarray(jax.jit(lambda p, v: forward(p, v, cfg))(params, x))
    assert y.shape == (1, 4001) and np.isfinite(y).all()
