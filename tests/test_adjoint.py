"""Adjoint gradient tests (SURVEY.md §4, test plan item 2): the augmented
reverse-time adjoint must match direct backprop through the differentiable
scan-mode solver to tight relative error — the analogue of the reference's
adjoint-vs-direct gradient equality tests (torchdiffeq/tests/gradient_tests.py,
UNVERIFIED)."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_features_tpu.solver import odeint, odeint_adjoint

# Core-correctness fast tier (pytest -m fast, VERDICT r4 #5).
pytestmark = pytest.mark.fast


def _dynamics(params, t, y):
    """A small dense net with genuine t-dependence: y' = tanh(y W + b) * c(t)."""
    h = jnp.tanh(y @ params["w"] + params["b"])
    return h * jnp.cos(params["freq"] * jnp.asarray(t))


def _make_params(key, dim):
    k1, k2 = jax.random.split(key)
    return {
        "w": 0.5 * jax.random.normal(k1, (dim, dim)),
        "b": 0.1 * jax.random.normal(k2, (dim,)),
        "freq": jnp.asarray(1.3),
    }


TOL = dict(rtol=1e-9, atol=1e-11)


def _loss_adjoint(params, y0, ts):
    ys, _ = odeint_adjoint(_dynamics, params, y0, ts, **TOL)
    # Use the full trajectory so interior observation times get cotangents.
    return jnp.sum(ys**2) + jnp.sum(jnp.sin(ys[-1]))


def _loss_direct(params, y0, ts):
    def f(t, y):
        return _dynamics(params, t, y)

    ys, _ = odeint(f, y0, ts, unroll="scan", max_steps=256, **TOL)
    return jnp.sum(ys**2) + jnp.sum(jnp.sin(ys[-1]))


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    dim = 3
    params = _make_params(key, dim)
    y0 = jax.random.normal(jax.random.PRNGKey(1), (4, dim))
    ts = jnp.asarray([0.0, 0.4, 1.0])
    return params, y0, ts


def test_adjoint_matches_direct_params_and_y0(setup):
    params, y0, ts = setup
    g_adj = jax.grad(_loss_adjoint, argnums=(0, 1))(params, y0, ts)
    g_dir = jax.grad(_loss_direct, argnums=(0, 1))(params, y0, ts)
    flat_adj = jax.flatten_util.ravel_pytree(g_adj)[0]
    flat_dir = jax.flatten_util.ravel_pytree(g_dir)[0]
    np.testing.assert_allclose(
        np.asarray(flat_adj), np.asarray(flat_dir), rtol=1e-5, atol=1e-8
    )


def test_adjoint_time_gradients(setup):
    params, y0, ts = setup
    g_adj = jax.grad(_loss_adjoint, argnums=2)(params, y0, ts)
    g_dir = jax.grad(_loss_direct, argnums=2)(params, y0, ts)
    np.testing.assert_allclose(
        np.asarray(g_adj), np.asarray(g_dir), rtol=1e-4, atol=1e-7
    )


def test_adjoint_final_state_only(setup):
    """Typical training loss: only ys[-1] used."""
    params, y0, ts = setup

    def loss_a(p):
        ys, _ = odeint_adjoint(_dynamics, p, y0, ts, **TOL)
        return jnp.sum(ys[-1] ** 2)

    def loss_d(p):
        ys, _ = odeint(
            lambda t, y: _dynamics(p, t, y), y0, ts, unroll="scan",
            max_steps=256, **TOL,
        )
        return jnp.sum(ys[-1] ** 2)

    g_a = jax.flatten_util.ravel_pytree(jax.grad(loss_a)(params))[0]
    g_d = jax.flatten_util.ravel_pytree(jax.grad(loss_d)(params))[0]
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_d), rtol=1e-5,
                               atol=1e-8)


def test_adjoint_value_matches_plain_odeint(setup):
    params, y0, ts = setup
    ys_a, stats_a = odeint_adjoint(_dynamics, params, y0, ts, **TOL)
    ys_p, stats_p = odeint(
        lambda t, y: _dynamics(params, t, y), y0, ts, **TOL
    )
    np.testing.assert_allclose(np.asarray(ys_a), np.asarray(ys_p), rtol=1e-12)
    assert int(stats_a.nfe[0]) == int(stats_p.nfe[0])


def test_adjoint_jits(setup):
    params, y0, ts = setup
    g = jax.jit(jax.grad(_loss_adjoint))(params, y0, ts)
    assert np.all(np.isfinite(np.asarray(jax.flatten_util.ravel_pytree(g)[0])))


def test_seminorm_adjoint_cuts_backward_nfe(setup):
    """Seminorm control (Kidger et al. 2020): same gradients to ~rtol, fewer
    backward NFE than the full-norm adjoint."""
    from neural_ode_features_tpu.solver import set_backward_nfe_tap

    params, y0, ts = setup
    counts = []

    def tap(n):
        counts.append(int(n))

    set_backward_nfe_tap(tap)
    try:
        def loss(p, semi):
            ys, _ = odeint_adjoint(_dynamics, p, y0, ts,
                                   adjoint_seminorm=semi, **TOL)
            return jnp.sum(ys[-1] ** 2)

        g_full = jax.grad(lambda p: loss(p, False))(params)
        nfe_full = counts[-1]
        g_semi = jax.grad(lambda p: loss(p, True))(params)
        nfe_semi = counts[-1]
    finally:
        set_backward_nfe_tap(None)

    a = jax.flatten_util.ravel_pytree(g_full)[0]
    b = jax.flatten_util.ravel_pytree(g_semi)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-7)
    assert nfe_semi <= nfe_full, (nfe_semi, nfe_full)


def test_adjoint_explicit_zero_atol_respected(setup):
    """Regression (code review): adjoint_atol=0.0 was discarded by a falsy
    `or` fallback and silently replaced with the forward atol.  Honouring it
    makes the backward solve *fail* for these dynamics — pure-relative error
    control is ill-posed whenever a state component sits at exactly 0 (a_θ
    starts there; y components cross zero), for the reference's solver just
    the same — and that failure must surface as NaN gradients, never as
    silent zeros (or, as before the fix, as silently different tolerances)."""
    params, y0, ts = setup

    def grad_with(**adj_kw):
        return jax.flatten_util.ravel_pytree(jax.grad(lambda p: jnp.sum(
            odeint_adjoint(_dynamics, p, y0, ts, rtol=1e-6, atol=1e-8,
                           adjoint_max_steps=512, **adj_kw)[0][-1] ** 2
        ))(params))[0]

    flat_zero = grad_with(adjoint_atol=0.0, adjoint_rtol=1e-6)
    assert np.all(np.isnan(np.asarray(flat_zero))), "failure must be loud"

    # The same override with a positive atol succeeds — proving the 0.0 was
    # actually honoured rather than replaced by the forward value.
    flat_pos = grad_with(adjoint_atol=1e-9, adjoint_rtol=1e-6)
    assert np.all(np.isfinite(np.asarray(flat_pos)))


def test_scan_remat_matches_scan_gradients(setup):
    """'scan_remat' (checkpointed body) must give the same values and
    gradients as plain 'scan' — only the memory/recompute trade-off differs."""
    params, y0, ts = setup

    def loss(p, mode):
        ys, _ = odeint(lambda t, y: _dynamics(p, t, y), y0, ts,
                       unroll=mode, max_steps=128, **TOL)
        return jnp.sum(ys**2)

    for mode_pair in [("scan", "scan_remat")]:
        va, ga = jax.value_and_grad(lambda p: loss(p, mode_pair[0]))(params)
        vb, gb = jax.value_and_grad(lambda p: loss(p, mode_pair[1]))(params)
        np.testing.assert_allclose(float(va), float(vb), rtol=1e-12)
        fa = jax.flatten_util.ravel_pytree(ga)[0]
        fb = jax.flatten_util.ravel_pytree(gb)[0]
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), rtol=1e-9)


def test_interpolated_adjoint_matches_reintegrate(setup):
    """adjoint_mode='interpolated' (Daulbaev et al. 2020): gradients must
    match the reintegrating adjoint to solver tolerance; values identical."""
    params, y0, ts = setup

    def grads(mode):
        def loss(p):
            ys, _ = odeint_adjoint(_dynamics, p, y0, ts, adjoint_mode=mode,
                                   dense_max_steps=256, **TOL)
            return jnp.sum(ys**2) + jnp.sum(jnp.sin(ys[-1]))

        v, g = jax.value_and_grad(loss)(params)
        return float(v), jax.flatten_util.ravel_pytree(g)[0]

    v_r, g_r = grads("reintegrate")
    v_i, g_i = grads("interpolated")
    np.testing.assert_allclose(v_i, v_r, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(g_i), np.asarray(g_r),
                               rtol=1e-4, atol=1e-7)


def test_interpolated_adjoint_with_seminorm(setup):
    params, y0, ts = setup

    def loss(p):
        ys, _ = odeint_adjoint(_dynamics, p, y0, ts,
                               adjoint_mode="interpolated",
                               adjoint_seminorm=True, **TOL)
        return jnp.sum(ys[-1] ** 2)

    g = jax.flatten_util.ravel_pytree(jax.grad(loss)(params))[0]
    ref = jax.flatten_util.ravel_pytree(jax.grad(lambda p: jnp.sum(
        odeint_adjoint(_dynamics, p, y0, ts, **TOL)[0][-1] ** 2))(params))[0]
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), rtol=1e-4,
                               atol=1e-7)


def test_nfe_sink_side_channel(setup):
    """The nfe_sink "gradient" is the backward-solve NFE: positive, integer-
    valued, and invariant to the incoming cotangent scale (it is a count, not
    a derivative) — the backend-portable replacement for the io_callback tap
    (VERDICT r1 #7; reference logs nfe_b per batch, train.py:~170 UNVERIFIED).
    """
    params, y0, ts = setup

    def loss(p, sink, scale):
        ys, _ = odeint_adjoint(
            _dynamics, p, y0, ts, nfe_sink=sink, **TOL
        )
        return scale * jnp.sum(ys[-1] ** 2)

    (_, nfe_b1) = jax.grad(loss, argnums=(0, 1))(params, jnp.zeros(()), 1.0)
    (_, nfe_b7) = jax.grad(loss, argnums=(0, 1))(params, jnp.zeros(()), 7.0)
    assert float(nfe_b1) > 0
    assert float(nfe_b1) == float(nfe_b7)  # count, not cotangent-scaled
    assert float(nfe_b1) == int(nfe_b1)

    # Default (no sink passed): public API unchanged, grads still flow.
    g = jax.grad(_loss_adjoint)(params, y0, ts)
    assert np.isfinite(jax.flatten_util.ravel_pytree(g)[0]).all()


def test_adjoint_per_sample_time_contract(setup):
    """With error_control='per_sample' the forward hands func a (B,)-shaped
    t; the backward (which runs batch-global internally) must honour the
    same contract — a func indexing t per-sample used to crash only under
    jax.grad (code-review r3)."""
    params, y0, ts = setup

    def f_persample(p, t, y):
        # Strictly per-sample contract: t MUST be (B,).
        h = jnp.tanh(y @ p["w"] + p["b"])
        return h * jnp.cos(p["freq"] * t)[:, None]

    def loss_ps(p):
        ys, _ = odeint_adjoint(
            f_persample, p, y0, ts, error_control="per_sample", **TOL
        )
        return jnp.sum(ys**2)

    def loss_global(p):
        ys, _ = odeint_adjoint(_dynamics, p, y0, ts, **TOL)
        return jnp.sum(ys**2)

    g_ps = jax.grad(loss_ps)(params)
    g_gl = jax.grad(loss_global)(params)
    a = jax.flatten_util.ravel_pytree(g_ps)[0]
    b = jax.flatten_util.ravel_pytree(g_gl)[0]
    assert np.isfinite(np.asarray(a)).all()
    # Same dynamics, same solve at tight tol: gradients must agree closely
    # (per-sample vs global stepping differ only through step sequences).
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-8)


def test_adjoint_invalid_combos_rejected_at_call(setup):
    """Config conflicts must raise at odeint_adjoint(), not deep inside the
    first jax.grad trace (code-review r3)."""
    params, y0, ts = setup
    with pytest.raises(ValueError, match="fixed-grid"):
        odeint_adjoint(_dynamics, params, y0, ts, method="rk4",
                       adjoint_seminorm=True)
    with pytest.raises(ValueError, match="adaptive RK"):
        odeint_adjoint(_dynamics, params, y0, ts, method="adams",
                       adjoint_mode="interpolated")


def test_nfe_sink_counts_time_grad_evals(setup):
    """The sink cotangent counts ALL backward dynamics evaluations,
    including the one direct f(t_i, y_i) eval per interval for the
    observation-time gradients (code-review r3: was undercounting by
    T-1)."""
    params, y0, _ = setup

    def nfe_b(ts):
        def loss(p, sink):
            ys, _ = odeint_adjoint(_dynamics, p, y0, ts, nfe_sink=sink,
                                   **TOL)
            return jnp.sum(ys**2)

        _, s = jax.grad(loss, argnums=(0, 1))(params, jnp.zeros(()))
        return float(s)

    # Same span, denser observation grid: each extra interval adds its
    # direct time-grad eval on top of the (roughly similar) solve work.
    n2 = nfe_b(jnp.asarray([0.0, 1.0]))
    n5 = nfe_b(jnp.asarray([0.0, 0.25, 0.5, 0.75, 1.0]))
    assert n2 == int(n2) and n5 == int(n5)
    assert n5 >= n2 + 3  # at least the 3 extra per-interval evals


def test_nfe_sink_derived_from_traced_inputs_rejected(setup):
    """VERDICT r3 #7: a sink COMPUTED from traced jit inputs silently
    chain-rules the eval count into real gradients; under jit this is
    detectable in the in-flight jaxpr frame and must raise at trace time."""
    params, y0, ts = setup

    def loss_with_derived_sink(p):
        # The classic footgun: a "zero" scalar manufactured from params.
        sink = p["freq"] * 0.0 + p["b"].sum() * 0.0
        ys, _ = odeint_adjoint(_dynamics, p, y0, ts, nfe_sink=sink, **TOL)
        return jnp.sum(ys**2)

    with pytest.raises(ValueError, match="COMPUTED from traced inputs"):
        jax.jit(jax.grad(loss_with_derived_sink))(params)

    # Even a nonzero-derivative derivation (the gradient-corrupting case).
    def loss_mean_sink(p):
        ys, _ = odeint_adjoint(_dynamics, p, y0, ts,
                               nfe_sink=p["b"].mean(), **TOL)
        return jnp.sum(ys**2)

    with pytest.raises(ValueError, match="COMPUTED from traced inputs"):
        jax.jit(jax.grad(loss_mean_sink))(params)


def test_nfe_sink_derived_rejected_under_vmap(setup):
    """code-review r4: BatchTracer stores its inner tracer as ``.val`` (not
    ``.primal``), so the unwrap loop must follow both or a derived sink
    inside a vmapped body — e.g. the population trainer's per-seed epoch —
    silently evades the guard."""
    params, y0, ts = setup

    def per_seed_loss(p, scale):
        sink = scale * 0.0  # derived from a vmapped traced input
        ys, _ = odeint_adjoint(_dynamics, p, y0, ts, nfe_sink=sink, **TOL)
        return jnp.sum(ys**2)

    def batched(p, scales):
        return jax.vmap(lambda s: per_seed_loss(p, s))(scales).sum()

    with pytest.raises(ValueError, match="COMPUTED from traced inputs"):
        jax.jit(jax.grad(batched))(params, jnp.ones(3))

    # The documented pattern stays accepted under vmap: per-lane sinks
    # passed as their own vmapped argument.
    def ok(p, sinks):
        def lane(s):
            ys, _ = odeint_adjoint(_dynamics, p, y0, ts, nfe_sink=s, **TOL)
            return jnp.sum(ys[-1] ** 2)
        return jax.vmap(lane)(sinks).sum()

    (_, nfe_b) = jax.jit(jax.grad(ok, argnums=(0, 1)))(params, jnp.zeros(3))
    assert np.isfinite(np.asarray(nfe_b)).all()


def test_nfe_sink_legitimate_forms_accepted(setup):
    """The guard must not flag correct usage: a dedicated jit argument, a
    fresh jnp.zeros(()) created inside jit, and a stop_gradient-wrapped
    derivation (stop_gradient also cuts the chain rule, so it is safe)."""
    params, y0, ts = setup

    def loss(p, sink):
        ys, _ = odeint_adjoint(_dynamics, p, y0, ts, nfe_sink=sink, **TOL)
        return jnp.sum(ys[-1] ** 2)

    # 1. Sink as its own traced argument (the documented pattern).
    _, nfe_b = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, jnp.zeros(()))
    assert float(nfe_b) > 0

    # 2. Fresh constant created inside the jit trace.
    def loss_fresh(p):
        ys, _ = odeint_adjoint(_dynamics, p, y0, ts,
                               nfe_sink=jnp.zeros(()), **TOL)
        return jnp.sum(ys[-1] ** 2)

    g = jax.jit(jax.grad(loss_fresh))(params)
    assert np.isfinite(jax.flatten_util.ravel_pytree(g)[0]).all()

    # 3. stop_gradient cuts the walk exactly where it cuts the chain rule.
    def loss_sg(p):
        sink = jax.lax.stop_gradient(p["b"].sum() * 0.0)
        ys, _ = odeint_adjoint(_dynamics, p, y0, ts, nfe_sink=sink, **TOL)
        return jnp.sum(ys[-1] ** 2)

    g = jax.jit(jax.grad(loss_sg))(params)
    assert np.isfinite(jax.flatten_util.ravel_pytree(g)[0]).all()
