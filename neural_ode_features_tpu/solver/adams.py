"""Adaptive-step Adams–Bashforth–Moulton (PECE) multistep solver.

Capability parity with the reference's adaptive ``adams`` method (reference:
torchdiffeq/_impl/adams.py ``VariableCoefficientAdamsBashforth`` :~1-400 —
UNVERIFIED, empty mount, SURVEY.md §2.2), redesigned for one on-device
``lax.while_loop``:

  * predictor (AB) / corrector (AM) with **variable coefficients** computed
    at runtime from the actual (non-uniform) history node positions: the
    integration weights are the exact integrals of the Lagrange basis over
    the step — no uniform-grid assumption;
  * order ramps 1 → ``max_order`` (default 8, cap 12; the reference ramps
    1–12).  The weight systems are dual Vandermonde solves, which a generic
    ``linalg.solve`` cannot survive in f32 past order ~5 (measured rel.
    error 1.9e-5 at order 8, 4.6e-2 at order 12); we use the
    Björck–Pereyra O(k²) recurrences instead (Golub & Van Loan §4.6),
    measured 2.4e-7 / 1.3e-6 — stable in the TPU compute dtype;
  * per-sample step control and NFE accounting like the RK path (the carry
    holds per-sample history nodes, times and done-masks);
  * start-up by order ramping: the first steps use k = 1, 2, … node subsets
    (selected with masks, everything fixed-shape for XLA);
  * PECE: two dynamics evaluations per attempted step;
  * predictor–corrector difference (Milne device) as the error estimate —
    conservative w.r.t. the reference's estimator, same tolerance semantics;
  * *order-matched* dense output: requested times inside an accepted step
    are evaluated with the corrector's own Lagrange interpolant
    (∫₀ˣ weights), so interpolation is exact exactly when the step is —
    a fixed lower-order Hermite diverged on polynomial dynamics where
    near-zero error estimates let dt grow without bound.

Order selection (round 2): like the reference's VCABM, the working order is
chosen *adaptively per sample* — each step evaluates the Milne error ratio
at orders (k−1, k, k+1) (all orders' predictors/correctors are computed
anyway for the fixed-shape ramp selects) and moves to whichever is
smallest, capped by available history.  This is the adaptive order
*decrease* round 1 lacked; the step controller still absorbs stability
penalties via rejections.  Measured: order 8 beats order 4 on NFE at tight
tolerances, and down-selection keeps order 12 from overstepping
(tests/test_adams.py).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .runge_kutta import (
    SolveStats,
    _error_ratio,
    _optimal_dt,
    _select_initial_step,
)

__all__ = ["adams_odeint"]

_MAX_ORDER_CAP = 12  # matches the reference's VCABM ceiling


class _Carry(NamedTuple):
    t: jnp.ndarray  # (B,)
    dt: jnp.ndarray  # (B,)
    y: jnp.ndarray  # (B, N)
    hist_t: jnp.ndarray  # (B, K) node times, newest first (hist_t[:,0] == t)
    hist_f: jnp.ndarray  # (B, K, N) dynamics at the nodes
    nhist: jnp.ndarray  # (B,) valid node count (>= 1)
    order: jnp.ndarray  # (B,) working predictor order (1..K), VCABM-style
    out: jnp.ndarray  # (T, B, N)
    nfe: jnp.ndarray
    naccept: jnp.ndarray
    nreject: jnp.ndarray
    done: jnp.ndarray
    iters: jnp.ndarray


def _bp_dual(x: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve the dual Vandermonde system Σ_i w_i x_i^j = b_j, j = 0..k-1,
    via the Björck–Pereyra recurrences (Golub & Van Loan alg. 4.6.2).

    ``x``: (B, k) distinct nodes; ``b``: (B, k) or (B, k, T) moments.
    Returns ``w`` shaped like ``b``.  O(k²) elementwise ops (static Python
    loops, k ≤ 12) — dramatically more accurate than a generic LU solve on
    the notoriously ill-conditioned Vandermonde matrix (f32 relative error
    at k=8: 2.4e-7 vs 1.9e-5; at k=12: 1.3e-6 vs 4.6e-2), and plain
    arithmetic, so it differentiates cleanly (no ``linalg.solve`` transpose
    rule re-injecting NaN from masked-out dummy nodes)."""
    k = x.shape[1]
    trailing = b.ndim == 3

    def col(v):  # broadcast an x-column against b's trailing dims
        return v[:, None] if trailing else v

    bs = [b[:, j] for j in range(k)]
    xs = [x[:, j] for j in range(k)]
    for m in range(k - 1):
        for j in range(k - 1, m, -1):
            bs[j] = bs[j] - col(xs[m]) * bs[j - 1]
    for m in range(k - 2, -1, -1):
        for j in range(m + 1, k):
            bs[j] = bs[j] / col(xs[j] - xs[j - m - 1])
        for j in range(m, k - 1):
            bs[j] = bs[j] - bs[j + 1]
    return jnp.stack(bs, axis=1)


def _integration_weights(s: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact ∫₀¹ of the Lagrange interpolant through nodes at normalised
    positions ``s[..., :k]``: dual Vandermonde system with moments
    m_j = 1/(j+1).  s: (B, K) → w: (B, k)."""
    if k == 1:
        return jnp.ones_like(s[:, :1])
    moments = jnp.asarray([1.0 / (j + 1) for j in range(k)], s.dtype)
    b = jnp.broadcast_to(moments, s.shape[:-1] + (k,))
    return _bp_dual(s[:, :k], b)


def _partial_integration_weights(s: jnp.ndarray, k: int, x: jnp.ndarray):
    """∫₀ˣ of the Lagrange interpolant, for several upper limits at once:
    moments m_j(x) = x^{j+1}/(j+1).  s: (B, K); x: (T, B) → (B, k, T).

    This is the solver's *order-matched dense output*: interpolating y(x) as
    y0 + dt·Σ w_i(x) f_i is exact exactly when the corrector step itself is
    (e.g. polynomial dynamics), unlike a fixed cubic Hermite — which went
    badly wrong when near-zero error estimates let dt grow without bound."""
    x_t = jnp.moveaxis(x, 0, -1)  # (B, T)
    b = jnp.stack(
        [x_t ** (j + 1) / (j + 1) for j in range(k)], axis=-2
    )  # (B, k, T)
    return _bp_dual(s[:, :k], b)  # (B, k, T)


def _combine(weights, fs, k):
    """Σ_i w_i f_i over the first k nodes: (B, k) × (B, K, N) → (B, N).

    precision pin: TPU dot_general defaults to bf16 multiplies; this
    contraction forms the predictor/corrector states themselves, so it must
    run in f32 (same class as runge_kutta._dense_write's pin)."""
    return jnp.einsum("bi,bin->bn", weights, fs[:, :k],
                      precision=lax.Precision.HIGHEST)


def adams_odeint(
    func: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    rtol: float,
    atol: float,
    *,
    max_steps: int = 2**14,
    first_step: float | None = None,
    safety: float = 0.9,
    ifactor: float = 2.0,  # conservative growth for multistep stability
    dfactor: float = 0.2,
    unroll: str = "while",
    error_mask: jnp.ndarray | None = None,
    max_order: int = 8,
) -> tuple[jnp.ndarray, SolveStats]:
    """Adaptive ABM solve over monotonic ``ts``; same contract as
    :func:`..runge_kutta.adaptive_odeint`.  ``max_order`` caps the order
    ramp (2..12; the reference's VCABM ramps to 12 — order > ~8 rarely pays
    below f64 and costs history memory, hence the default)."""
    if not 2 <= max_order <= _MAX_ORDER_CAP:
        raise ValueError(
            f"max_order must be in [2, {_MAX_ORDER_CAP}], got {max_order}"
        )
    _K = max_order
    dtype = y0.dtype
    batch, n = y0.shape
    n_out = ts.shape[0]
    ts = ts.astype(dtype)

    direction = jnp.sign(ts[-1] - ts[0])
    t_final = ts[-1]

    t0 = jnp.full((batch,), ts[0], dtype)
    f0 = func(t0, y0)
    nfe0 = jnp.ones((batch,), jnp.int32)
    if first_step is None:
        # The ramp starts at order ~1-2; size the Hairer step for that, not
        # for the steady-state order (avoids guaranteed start-up rejections).
        dt0 = _select_initial_step(func, t0, y0, f0, direction, rtol, atol, 1)
        nfe0 = nfe0 + 1
    else:
        dt0 = jnp.full((batch,), first_step, dtype) * direction

    hist_t0 = jnp.broadcast_to(t0[:, None], (batch, _K))
    hist_f0 = jnp.broadcast_to(f0[:, None, :], (batch, _K, n))
    out0 = jnp.zeros((n_out, batch, n), dtype).at[0].set(y0)

    carry0 = _Carry(
        t=t0, dt=dt0, y=y0,
        hist_t=hist_t0, hist_f=hist_f0,
        nhist=jnp.ones((batch,), jnp.int32),
        order=jnp.ones((batch,), jnp.int32),
        out=out0, nfe=nfe0,
        naccept=jnp.zeros((batch,), jnp.int32),
        nreject=jnp.zeros((batch,), jnp.int32),
        done=jnp.zeros((batch,), bool),
        iters=jnp.zeros((), jnp.int32),
    )

    def body(c: _Carry) -> _Carry:
        active = ~c.done
        t, dt, y = c.t, c.dt, c.y
        dt_col = dt[:, None]
        t1 = t + dt

        # Normalised history positions: s_i = (hist_t_i - t) / dt  (≤ 0).
        # Invalid (not-yet-filled) history columns hold duplicated node
        # times, which would make the Vandermonde systems below exactly
        # singular — their NaN primals are masked by the order-ramp selects,
        # but linalg.solve's transpose rule re-injects NaN into gradients in
        # scan (reverse-differentiable) mode.  Substitute distinct dummy
        # positions for them; their weights are never selected.
        col = jnp.arange(_K, dtype=jnp.int32)[None, :]
        s_raw = (c.hist_t - t[:, None]) / dt_col
        s_hist = jnp.where(
            col < c.nhist[:, None], s_raw, -(col.astype(dtype) + 1.0)
        )

        # --- Predict: AB-k at the per-sample working order (≤ history) ---
        k_pred = jnp.minimum(c.order, jnp.minimum(c.nhist, _K))
        pred_k = [None] * (_K + 1)
        for k in range(1, _K + 1):
            w = _integration_weights(s_hist, k)
            pred_k[k] = y + dt_col * _combine(w, c.hist_f, k)
        y_pred = pred_k[1]
        for k in range(2, _K + 1):
            y_pred = jnp.where((k_pred >= k)[:, None], pred_k[k], y_pred)

        f_pred = func(t1, y_pred)

        # --- Correct: AM over {t1} ∪ (k-1 newest history nodes) ---
        # Same dummy-node protection: corrector column j >= 1 is valid iff
        # j - 1 < nhist.
        s_corr = jnp.concatenate(
            [jnp.ones((batch, 1), dtype), s_hist[:, : _K - 1]], axis=1
        )
        f_corr_nodes = jnp.concatenate(
            [f_pred[:, None, :], c.hist_f[:, : _K - 1]], axis=1
        )
        k_corr = jnp.minimum(k_pred + 1, _K)
        corr_k = [None] * (_K + 1)
        for k in range(2, _K + 1):
            w = _integration_weights(s_corr, k)
            corr_k[k] = y + dt_col * _combine(w, f_corr_nodes, k)
        y_corr = corr_k[2]
        for k in range(3, _K + 1):
            y_corr = jnp.where((k_corr >= k)[:, None], corr_k[k], y_corr)

        f_new = func(t1, y_corr)

        # --- Milne error ratios at EVERY order (for VCABM order selection:
        # the per-order predictors/correctors are already computed for the
        # fixed-shape selects, so this costs only K extra (B, N) reductions,
        # no dynamics evals).  ratio_all[m-1] = ratio at predictor order m.
        ratio_all = jnp.stack(
            [
                _error_ratio(
                    corr_k[min(m + 1, _K)] - pred_k[m], y, y_corr, rtol,
                    atol, error_mask,
                )
                for m in range(1, _K + 1)
            ]
        )  # (_K, B)
        max_valid = jnp.minimum(c.nhist, _K)  # orders with real history
        m_idx = jnp.arange(1, _K + 1, dtype=jnp.int32)[:, None]
        inf = jnp.asarray(jnp.inf, ratio_all.dtype)
        ratio_all = jnp.where(m_idx <= max_valid[None, :], ratio_all, inf)

        def take_order(o):  # ratio at per-sample order o: (B,)
            return jnp.take_along_axis(
                ratio_all, (o - 1)[None, :], axis=0
            )[0]

        ratio = take_order(k_pred)
        accept = (ratio <= 1.0) & active

        # --- VCABM-style order update (on accept): move toward whichever
        # of {k−1, k, k+1} has the smallest Milne ratio; the +1 candidate
        # also ramps the startup (history permitting).
        k_lo = jnp.maximum(k_pred - 1, 1)
        k_hi = jnp.minimum(k_pred + 1, _K)
        r_lo, r_cur, r_hi = take_order(k_lo), ratio, take_order(k_hi)
        best = jnp.where(
            (r_hi < r_cur) & (r_hi <= r_lo), k_hi,
            jnp.where(r_lo < r_cur, k_lo, k_pred),
        )
        # On rejection the order may move DOWN toward this attempt's best
        # candidate (never up): reference VCABM also lowers order after
        # rejections, so a sample stuck rejecting at a too-high order can
        # recover without waiting for dt to shrink (ADVICE r2).
        new_order = jnp.where(accept, best, jnp.minimum(best, c.order))

        # Controller exponent = the power the Milne error estimate scales
        # with: the predictor's local error order, k+1 (so 9 at full
        # order-8 history, matching how the RK path passes its estimate
        # order).
        order_f = (k_pred + 1).astype(dtype)
        new_dt = jnp.where(
            active,
            _optimal_dt(dt, ratio, accept, order_f, safety, ifactor,
                        dfactor),
            dt,
        )

        # --- order-matched Lagrange dense output on [t, t1] ---
        # y(t + x·dt) = y + dt·Σ_i w_i(x) f_i over the corrector's nodes, at
        # the corrector's own order — exact whenever the step is (fixed
        # cubic Hermite silently diverged on polynomial dynamics where
        # near-zero error estimates let dt grow without bound).
        covered = (
            accept[None, :]
            & (direction * (ts[:, None] - t[None, :]) > 0.0)
            & (direction * (ts[:, None] - t1[None, :]) <= 0.0)
        )

        def _dense_write(out_buf):
            x = jnp.clip((ts[:, None] - t[None, :]) / dt[None, :], 0.0, 1.0)
            y_int = None
            for k in range(2, _K + 1):
                w_x = _partial_integration_weights(s_corr, k, x)  # (B,k,T)
                cand = y[None] + dt_col[None] * jnp.einsum(
                    "bkt,bkn->tbn", w_x, f_corr_nodes[:, :k],
                    precision=lax.Precision.HIGHEST,  # TPU bf16-dot default
                )
                if y_int is None:
                    y_int = cand
                else:
                    y_int = jnp.where(
                        (k_corr >= k)[None, :, None], cand, y_int
                    )
            return jnp.where(covered[:, :, None], y_int, out_buf)

        # Most iterations cover no output time (rejections, and interior
        # steps of a sparse ts grid): gate the K-1 Björck–Pereyra weight
        # solves + (B,k,T)x(B,k,N) einsums + full (T,B,N) buffer rewrite
        # behind one any(covered) — the same measured win as the RK path's
        # gated dense write (runge_kutta.py). (code-review r3)
        out = lax.cond(jnp.any(covered), _dense_write, lambda o: o, c.out)

        # --- masked history shift on accept ---
        acc_col = accept[:, None]
        new_hist_t = jnp.where(
            acc_col,
            jnp.concatenate([t1[:, None], c.hist_t[:, : _K - 1]], axis=1),
            c.hist_t,
        )
        new_hist_f = jnp.where(
            accept[:, None, None],
            jnp.concatenate([f_new[:, None, :], c.hist_f[:, : _K - 1]], axis=1),
            c.hist_f,
        )
        reached = accept & (direction * (t1 - t_final) >= 0.0)

        return _Carry(
            t=jnp.where(accept, t1, t),
            dt=new_dt,
            y=jnp.where(acc_col, y_corr, y),
            hist_t=new_hist_t,
            hist_f=new_hist_f,
            nhist=jnp.where(accept, jnp.minimum(c.nhist + 1, _K), c.nhist),
            order=new_order,
            out=out,
            nfe=c.nfe + jnp.where(active, 2, 0),
            naccept=c.naccept + accept.astype(jnp.int32),
            nreject=c.nreject + (active & ~accept).astype(jnp.int32),
            done=c.done | reached,
            iters=c.iters + 1,
        )

    if unroll == "while":
        final = lax.while_loop(
            lambda c: (~jnp.all(c.done)) & (c.iters < max_steps), body, carry0
        )
    elif unroll in ("scan", "scan_remat"):
        body_fn = jax.checkpoint(body) if unroll == "scan_remat" else body
        final, _ = lax.scan(lambda c, _: (body_fn(c), None), carry0, None,
                            length=max_steps)
    else:
        raise ValueError(f"unknown unroll mode {unroll!r}")

    return final.out, SolveStats(
        nfe=final.nfe,
        naccept=final.naccept,
        nreject=final.nreject,
        success=final.done,
    )
