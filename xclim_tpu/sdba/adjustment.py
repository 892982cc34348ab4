"""Bias-adjustment methods: EQM, DQM, QDM, Scaling
(reference: the external xsdba package re-exported as xclim.sdba —
xclim:src/xclim/sdba.py:1-28; train/adjust contract per xclim docs/sdba.rst:23-56).

TPU-first design: training is one static group-gather + batched quantile
kernel; adjustment is group-sliced binary search + linear interpolation over
the quantile axis — no per-group Python loops, everything jit-able. Trained
state is an explicit, serializable dict of device arrays (``.ds``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.core.units import convert_units_to, str2pint, units2pint
from xclim_tpu.ops.quantile import nan_quantile
from xclim_tpu.sdba.grouping import Grouper
from xclim_tpu.sdba.utils import (
    equally_spaced_nodes,
    gather_groups,
    grouped_quantile,
    grouped_rank,
    interp_hat_nodes,
    interp_on_quantiles,
    windowed_doy_mean,
    windowed_doy_quantile,
)


def _spacify(*arrays):
    """Flatten all trailing space dims into one lane axis.

    (G, K, *S) → (G, K, prod(S)); 1-D series (G, K) → (G, K, 1). Returns the
    original space shape so callers can reshape back with
    ``a.reshape(a.shape[:2] + sshape)``."""
    sshape = arrays[0].shape[2:]
    out = [a.reshape(a.shape[:2] + (-1,)) if a.ndim > 2 else a[..., None]
           for a in arrays]
    return out, sshape

__all__ = ["EmpiricalQuantileMapping", "DetrendedQuantileMapping",
           "QuantileDeltaMapping", "Scaling", "LOCI", "ExtremeValues",
           "npdf_transform", "random_rotation_matrices"]


def _apply_kind(x, factor, kind):
    return x + factor if kind == "+" else x * factor


def _inv_kind(a, b, kind):
    """Adjustment factor between a and b: a - b or a / b."""
    if kind == "+":
        return a - b
    return a / jnp.where(b == 0, jnp.nan, b)


# ---------------------------------------------------------------------------
# Single-program jitted cores. The tunnel backend pays a ~30 ms dispatch
# floor per eager op; running train/adjust as dozens of eager ops cost
# seconds of pure dispatch, so each method lowers to ONE compiled program
# (measured: QDM adjust 3.5 s eager → dispatch-floor bound jitted).
# ---------------------------------------------------------------------------


def _grouped_quantile_tf(xf, table, q, alpha=1.0, beta=1.0):
    """(G, nq, ...) quantiles of a time-first array under a gather table."""
    g = gather_groups(xf, table)
    out = nan_quantile(g, q, axis=1, alpha=alpha, beta=beta)  # (nq, G, ...)
    return jnp.moveaxis(out, 0, 1)


def _grouped_mean_tf(xf, table):
    g = gather_groups(xf, table)
    ok = ~jnp.isnan(g)
    s = jnp.where(ok, g, 0).sum(axis=1)
    n = ok.sum(axis=1)
    return jnp.where(n > 0, s / jnp.maximum(n, 1), jnp.nan)  # (G, ...)


@functools.partial(jax.jit, static_argnames=("kind",))
def _qm_train_core(xref, xhist, tref, thist, q, *, kind):
    ref_q = _grouped_quantile_tf(xref, tref, q)
    hist_q = _grouped_quantile_tf(xhist, thist, q)
    return _inv_kind(ref_q, hist_q, kind), hist_q


@functools.partial(jax.jit, static_argnames=("q_tuple", "kind", "window",
                                              "use_pallas"))
def _qm_train_core_doy(xref, xhist, dtref, dthist, *, q_tuple, kind, window,
                       use_pallas=None):
    """Day-of-year windowed trainer on the merge kernel — no windowed
    gather+sort (ops/pallas/winquantile.py; ~10x the round-2 train).
    q_tuple is static: the kernel bakes the Hyndman-Fan node offsets in.
    use_pallas is static so a failed optimistic Mosaic compile can retrace
    the XLA variant (see _run_train_core)."""
    q = np.asarray(q_tuple, dtype=np.float32)
    ref_q = windowed_doy_quantile(xref, dtref, window, q,
                                  use_pallas=use_pallas)
    hist_q = windowed_doy_quantile(xhist, dthist, window, q,
                                   use_pallas=use_pallas)
    return _inv_kind(ref_q, hist_q, kind), hist_q


@functools.partial(jax.jit, static_argnames=("kind",))
def _dqm_train_core(xref, xhist, tref, thist, gid_hist, q, *, kind):
    mu_ref = _grouped_mean_tf(xref, tref)
    mu_hist = _grouped_mean_tf(xhist, thist)
    scaling = _inv_kind(mu_ref, mu_hist, kind)  # (G, ...)
    xh_sc = _apply_kind(xhist, jnp.take(scaling, gid_hist, axis=0), kind)
    ref_q = _grouped_quantile_tf(xref, tref, q)
    hist_q = _grouped_quantile_tf(xh_sc, thist, q)
    return _inv_kind(ref_q, hist_q, kind), hist_q, scaling


@functools.partial(jax.jit, static_argnames=("q_tuple", "kind", "window",
                                              "use_pallas"))
def _dqm_train_core_doy(xref, xhist, dtref, dthist, gid_hist, *, q_tuple,
                        kind, window, use_pallas=None):
    q = np.asarray(q_tuple, dtype=np.float32)
    mu_ref = windowed_doy_mean(xref, dtref, window)
    mu_hist = windowed_doy_mean(xhist, dthist, window)
    scaling = _inv_kind(mu_ref, mu_hist, kind)  # (G, ...)
    xh_sc = _apply_kind(xhist, jnp.take(scaling, gid_hist, axis=0), kind)
    ref_q = windowed_doy_quantile(xref, dtref, window, q,
                                  use_pallas=use_pallas)
    hist_q = windowed_doy_quantile(xh_sc, dthist, window, q,
                                   use_pallas=use_pallas)
    return _inv_kind(ref_q, hist_q, kind), hist_q, scaling


def _run_train_core(core, *args, **kwargs):
    """Run a jitted doy train core with optimistic Pallas dispatch.

    ``use_pallas`` is decided by the tri-state winquantile probe: verified →
    Pallas; transient probe failure → ATTEMPT Pallas and, if the production
    compile also fails, demote the process to XLA and retrace (round-5: a
    flaky probe must not silently serve the 8x-slower XLA fallback —
    BENCH_DETAIL r4 "QDM 1k" 0.92x was exactly this)."""
    from xclim_tpu.ops.pallas.capability import set_winquantile_state
    from xclim_tpu.sdba.utils import wq_attempt

    use = wq_attempt()
    try:
        return core(*args, **kwargs, use_pallas=use)
    except Exception:
        if not use:
            raise
        set_winquantile_state("no")
        return core(*args, **kwargs, use_pallas=False)


def _eqm_adjust_body(xf, table, flat_pos, hist_q, af, *, kind, interp,
                     extrapolation):
    """EQM adjust on a time-first array; returns the time-first result."""
    g = gather_groups(xf, table)
    (g, hist_q, af), sshape = _spacify(g, hist_q, af)
    af_v = interp_on_quantiles(g, hist_q, af, method=interp,
                               extrapolation=extrapolation)  # (G, ms, C)
    adj = _apply_kind(g, af_v, kind)
    adj = adj.reshape(adj.shape[:2] + sshape)
    flat = adj.reshape((-1,) + adj.shape[2:])
    return flat[flat_pos]


_eqm_adjust_core = functools.partial(
    jax.jit, static_argnames=("kind", "interp", "extrapolation"))(
    lambda xf, table, flat_pos, hist_q, af, *, kind, interp, extrapolation:
    _eqm_adjust_body(xf, table, flat_pos, hist_q, af, kind=kind,
                     interp=interp, extrapolation=extrapolation))


@functools.partial(jax.jit, static_argnames=("kind", "interp",
                                             "extrapolation"))
def _qdm_adjust_core(xf, table, flat_pos, af, q, *, kind, interp,
                     extrapolation):
    g = gather_groups(xf, table)
    (g, af), sshape = _spacify(g, af)
    nvalid = jnp.sum(~jnp.isnan(g), axis=1).astype(jnp.int32)
    tau = grouped_rank(g, nvalid)  # (G, ms, C)
    if interp == "linear" and extrapolation == "constant":
        # shared sorted 1-D node vector: hat-basis contraction (71x the
        # searchsorted+gather path on the tunnel backend)
        af_v = interp_hat_nodes(tau, q, af)
    else:
        qx = jnp.broadcast_to(q.reshape((1, -1) + (1,) * (af.ndim - 2)),
                              af.shape)
        af_v = interp_on_quantiles(tau, qx, af, method=interp,
                                   extrapolation=extrapolation)
    adj = _apply_kind(g, af_v, kind)
    adj = adj.reshape(adj.shape[:2] + sshape)
    flat = adj.reshape((-1,) + adj.shape[2:])
    return flat[flat_pos]


@functools.partial(jax.jit, static_argnames=("q_tuple", "kind"))
def _qdm_adjust_core_doy(xf, table, flat_pos, af, *, q_tuple, kind):
    """QDM adjust on the fused Pallas rank+interp kernel
    (ops/pallas/qdmadjust.py) — one VMEM pass per doy block instead of the
    (G, ms, nq, C) one-hot materialization of _qdm_adjust_core."""
    from xclim_tpu.ops.pallas.qdmadjust import qdm_adjust_doy

    sshape = xf.shape[1:]
    xd = gather_groups(xf, table)                  # (G, ms, ...space)
    xd2 = xd.reshape(xd.shape[:2] + (-1,))
    af2 = af.reshape(af.shape[:2] + (-1,))
    out_d = qdm_adjust_doy(xd2, af2, np.asarray(q_tuple, np.float32),
                           kind=kind)
    flat = out_d.reshape((-1,) + out_d.shape[2:])
    out = flat[flat_pos]
    return out.reshape((out.shape[0],) + sshape)


@functools.partial(jax.jit, static_argnames=("kind", "interp",
                                             "extrapolation"))
def _dqm_adjust_core(xf, V, gid, table, flat_pos, hist_q, af, scaling, *,
                     kind, interp, extrapolation):
    """Scale → detrend → EQM → retrend, all in one program. xf time-first;
    V is the centered/scaled Vandermonde (T, deg+1)."""
    x_sc = _apply_kind(xf, jnp.take(scaling, gid, axis=0), kind)
    T = x_sc.shape[0]
    flat = x_sc.reshape(T, -1)
    valid = ~jnp.isnan(flat)
    f0 = jnp.where(valid, flat, 0.0)
    VtV = jnp.einsum("ti,tj,tc->cij", V, V, valid.astype(jnp.float32))
    Vty = jnp.einsum("ti,tc->ci", V, f0)
    coef = jnp.linalg.solve(VtV + 1e-8 * jnp.eye(V.shape[1])[None],
                            Vty[..., None])[..., 0]
    trend = jnp.einsum("ti,ci->tc", V, coef).reshape(x_sc.shape)
    residual = x_sc - trend
    # per-cell re-centering (a global scalar saturates the quantile lookup
    # off-table on spatially heterogeneous grids)
    tmean = jnp.nanmean(trend, axis=0, keepdims=True)
    if kind == "+":
        detrended = residual + tmean
    else:
        safe_trend = jnp.where(trend == 0, jnp.nan, trend)
        detrended = x_sc / safe_trend * tmean
    out = _eqm_adjust_body(detrended, table, flat_pos, hist_q, af, kind=kind,
                           interp=interp, extrapolation=extrapolation)
    if kind == "+":
        return out + (trend - tmean)
    return out * trend / tmean


class TrainAdjust:
    """Train-once, adjust-many base class (xsdba.TrainAdjust)."""

    _allow_diff_calendars = True

    def __init__(self, ds: dict, **params):
        self.ds = ds
        for k, v in params.items():
            setattr(self, k, v)

    @classmethod
    def train(cls, ref: ClimArray, hist: ClimArray, **kwargs):
        hist = convert_units_to(hist, ref, context="infer")
        group = Grouper(kwargs.pop("group", "time"), kwargs.pop("window", 1)) \
            if not isinstance(kwargs.get("group"), Grouper) else kwargs.pop("group")
        obj = cls._train(ref, hist, group=group, **kwargs)
        obj.train_units = ref.attrs.get("units", "")
        return obj

    def adjust(self, sim: ClimArray, **kwargs):
        sim = convert_units_to(sim, self.train_units, context="infer")
        out = self._adjust(sim, **kwargs)
        out.attrs = dict(sim.attrs)
        out.attrs["units"] = self.train_units
        out.attrs["history"] = (sim.attrs.get("history", "") +
                                f"\nBias-adjusted with {type(self).__name__}"
                                f"(group={self.group.group}, kind={self.kind}).")
        out.name = sim.name
        return out


class EmpiricalQuantileMapping(TrainAdjust):
    """EQM: adjustment factors between ref and hist quantiles per group
    (xsdba.EmpiricalQuantileMapping; xclim docs/sdba.rst).

    train: af(q) = ref_q(q) ∘ hist_q(q)⁻¹; adjust: sim + af(F_hist(sim)).
    """

    @classmethod
    def _train(cls, ref, hist, *, group: Grouper, nquantiles: int = 20,
               kind: str = "+"):
        q = equally_spaced_nodes(nquantiles) if np.isscalar(nquantiles) \
            else np.asarray(nquantiles)
        xref = jnp.moveaxis(ref.data, ref.time_axis, 0)
        xhist = jnp.moveaxis(hist.data, hist.time_axis, 0)
        if group.group == "time.dayofyear":
            af, hist_q = _run_train_core(
                _qm_train_core_doy,
                xref, xhist, group.device_doy_table(ref.time),
                group.device_doy_table(hist.time),
                q_tuple=tuple(float(v) for v in q), kind=kind,
                window=group.window)
        else:
            af, hist_q = _qm_train_core(xref, xhist,
                                        group.device_train_table(ref.time),
                                        group.device_train_table(hist.time),
                                        jnp.asarray(q, dtype=jnp.float32),
                                        kind=kind)
        return cls({"af": af, "hist_q": hist_q, "quantiles": np.asarray(q)},
                   group=group, kind=kind)

    def _adjust(self, sim: ClimArray, interp: str = "linear",
                extrapolation: str = "constant"):
        table, gid, flat_pos = self.group.device_adjust_table(sim.time)
        ax = sim.time_axis
        xf = jnp.moveaxis(sim.data, ax, 0)
        out = _eqm_adjust_core(xf, table, flat_pos, self.ds["hist_q"],
                               self.ds["af"], kind=self.kind, interp=interp,
                               extrapolation=extrapolation)
        return sim.copy(data=jnp.moveaxis(out, 0, ax))


class DetrendedQuantileMapping(TrainAdjust):
    """DQM: mean-scaling + EQM on scaled data + linear detrend of sim
    (xsdba.DetrendedQuantileMapping)."""

    @classmethod
    def _train(cls, ref, hist, *, group: Grouper, nquantiles: int = 20,
               kind: str = "+"):
        q = equally_spaced_nodes(nquantiles) if np.isscalar(nquantiles) \
            else np.asarray(nquantiles)
        xref = jnp.moveaxis(ref.data, ref.time_axis, 0)
        xhist = jnp.moveaxis(hist.data, hist.time_axis, 0)
        gid_hist = jnp.asarray(group.group_of_step(hist.time))
        if group.group == "time.dayofyear":
            af, hist_q, scaling = _run_train_core(
                _dqm_train_core_doy,
                xref, xhist, group.device_doy_table(ref.time),
                group.device_doy_table(hist.time), gid_hist,
                q_tuple=tuple(float(v) for v in q), kind=kind,
                window=group.window)
        else:
            af, hist_q, scaling = _dqm_train_core(
                xref, xhist, group.device_train_table(ref.time),
                group.device_train_table(hist.time), gid_hist,
                jnp.asarray(q, dtype=jnp.float32), kind=kind)
        return cls({"af": af, "hist_q": hist_q, "scaling": scaling,
                    "quantiles": np.asarray(q)}, group=group, kind=kind)

    def _adjust(self, sim: ClimArray, interp: str = "linear",
                extrapolation: str = "constant", detrend: int = 1):
        # scale by training factors, polynomial-detrend over decimal years
        # (multiplicative series detrend as a ratio around the trend, xsdba
        # PolyDetrend kind), EQM with the trained factors, retrend — one
        # compiled program.
        table, gid_t, flat_pos = self.group.device_adjust_table(sim.time)
        gid = jnp.asarray(self.group.group_of_step(sim.time))
        t_np = sim.time.decimal_year.astype(np.float64)
        t_np = t_np - t_np.mean()
        scale = np.abs(t_np).max()
        if scale > 0:
            t_np = t_np / scale
        V = jnp.asarray(np.stack([t_np ** k for k in range(detrend + 1)],
                                 axis=1).astype(np.float32))
        ax = sim.time_axis
        xf = jnp.moveaxis(sim.data, ax, 0)
        out = _dqm_adjust_core(xf, V, gid, table, flat_pos,
                               self.ds["hist_q"], self.ds["af"],
                               self.ds["scaling"], kind=self.kind,
                               interp=interp, extrapolation=extrapolation)
        return sim.copy(data=jnp.moveaxis(out, 0, ax))


class QuantileDeltaMapping(TrainAdjust):
    """QDM: af at the simulation's own empirical rank — preserves sim deltas
    (xsdba.QuantileDeltaMapping, Cannon et al. 2015)."""

    _train = EmpiricalQuantileMapping.__dict__["_train"]

    def _adjust(self, sim: ClimArray, interp: str = "linear",
                extrapolation: str = "constant"):
        table, gid, flat_pos = self.group.device_adjust_table(sim.time)
        ax = sim.time_axis
        xf = jnp.moveaxis(sim.data, ax, 0)
        qn = np.asarray(self.ds["quantiles"], dtype=np.float32)
        if (interp == "linear" and extrapolation == "constant"
                and self.kind in ("+", "*") and table.shape[1] <= 64
                and jnp.result_type(xf) == jnp.float32):
            from xclim_tpu.ops.pallas.capability import qdmadjust_supported

            if qdmadjust_supported():
                try:
                    out = _qdm_adjust_core_doy(
                        xf, table, flat_pos, self.ds["af"],
                        q_tuple=tuple(float(v) for v in qn), kind=self.kind)
                    return sim.copy(data=jnp.moveaxis(out, 0, ax))
                except Exception:
                    # production compile failed after a good probe
                    # (transient tunnel error): serve the XLA path below
                    pass
        out = _qdm_adjust_core(xf, table, flat_pos, self.ds["af"],
                               jnp.asarray(qn), kind=self.kind, interp=interp,
                               extrapolation=extrapolation)
        return sim.copy(data=jnp.moveaxis(out, 0, ax))


class Scaling(TrainAdjust):
    """Simple per-group mean scaling (xsdba.Scaling)."""

    @classmethod
    def _train(cls, ref, hist, *, group: Grouper, kind: str = "+"):
        scaling = _inv_kind(_grouped_mean(ref, group), _grouped_mean(hist, group), kind)
        return cls({"af": scaling}, group=group, kind=kind)

    def _adjust(self, sim: ClimArray, interp: str = "nearest"):
        return _apply_scaled(sim, self.ds["af"], self.group, self.kind)


@functools.partial(jax.jit, static_argnames=("th",))
def _loci_train_core(xref, xhist, tref, thist, *, th):
    """Per-group exceedance matching + scaling factors as one program."""
    gr = gather_groups(xref, tref)
    gh = gather_groups(xhist, thist)
    # exceedance probability of thresh in ref, per group
    wet = jnp.where(jnp.isnan(gr), jnp.nan, (gr >= th).astype(jnp.float32))
    frac = jnp.nanmean(wet, axis=1)  # (G, ...)
    # hist threshold at the same exceedance probability
    q = jnp.clip(1.0 - frac, 0.0, 1.0)
    gh_qfirst = jnp.moveaxis(gh, 1, 0)  # (maxlen, G, ...)
    s = jnp.sort(gh_qfirst, axis=0)
    nvalid = (~jnp.isnan(gh_qfirst)).sum(axis=0)
    # Hyndman-Fan type-7 on the valid prefix, vectorized over groups
    h = q * (nvalid - 1)
    lo = jnp.clip(jnp.floor(h).astype(jnp.int32), 0, s.shape[0] - 1)
    hi = jnp.clip(lo + 1, 0, s.shape[0] - 1)
    w = h - lo
    s_thresh = (jnp.take_along_axis(s, lo[None], axis=0)[0] * (1 - w) +
                jnp.take_along_axis(
                    s, jnp.minimum(hi, jnp.maximum(nvalid - 1, 0))[None],
                    axis=0)[0] * w)
    s_thresh = jnp.where(nvalid > 0, s_thresh, jnp.nan)
    # mean exceedance ratio
    mr = jnp.nanmean(jnp.where(gr >= th, gr, jnp.nan), axis=1) - th
    mh = jnp.nanmean(jnp.where(gh >= s_thresh[:, None], gh, jnp.nan),
                     axis=1) - s_thresh
    af = mr / jnp.where(mh == 0, jnp.nan, mh)
    return af, s_thresh


@functools.partial(jax.jit, static_argnames=("th",))
def _loci_adjust_core(xf, gid, af, s_thresh, *, th):
    afs = jnp.take(af, gid, axis=0)  # (T, ...)
    sts = jnp.take(s_thresh, gid, axis=0)
    return jnp.maximum(afs * (xf - sts) + th, 0.0)


class LOCI(TrainAdjust):
    """Local intensity scaling (Schmidli et al. 2006; xsdba.LOCI).

    train: per group, find the hist threshold with the same exceedance
    probability as `thresh` in ref, then the scaling factor equating mean
    exceedances. adjust: ``max(af * (sim - s_thresh) + thresh, 0)``.
    Designed for precipitation (wet-day intensity matching).
    """

    @classmethod
    def _train(cls, ref, hist, *, group: Grouper, thresh: str = "1 mm/d"):
        th = convert_units_to(str2pint(thresh), ref, context="infer") \
            if isinstance(thresh, str) else float(thresh)
        xref = jnp.moveaxis(ref.data, ref.time_axis, 0)
        xhist = jnp.moveaxis(hist.data, hist.time_axis, 0)
        af, s_thresh = _loci_train_core(
            xref, xhist, group.device_train_table(ref.time),
            group.device_train_table(hist.time), th=float(th))
        return cls({"af": af, "hist_thresh": s_thresh}, group=group,
                   kind="*", thresh=th)

    def _adjust(self, sim: ClimArray, interp: str = "linear"):
        gid = jnp.asarray(self.group.group_of_step(sim.time))
        ax = sim.time_axis
        xf = jnp.moveaxis(sim.data, ax, 0)
        out = _loci_adjust_core(xf, gid, self.ds["af"],
                                self.ds["hist_thresh"],
                                th=float(self.thresh))
        return sim.copy(data=jnp.moveaxis(out, 0, ax))


def _grouped_mean(da: ClimArray, grouper: Grouper):
    table = grouper.train_table(da.time)
    ax = da.time_axis
    xf = jnp.moveaxis(da.data, ax, 0)
    t = jnp.asarray(table)
    g = xf[jnp.maximum(t, 0)]
    okshape = t.shape + (1,) * (g.ndim - 2)
    ok = (t >= 0).reshape(okshape) & ~jnp.isnan(g)
    s = jnp.where(ok, g, 0).sum(axis=1)
    n = ok.sum(axis=1)
    return jnp.where(n > 0, s / jnp.maximum(n, 1), jnp.nan)  # (G, ...)


def _apply_scaled(da: ClimArray, scaling, grouper: Grouper, kind: str) -> ClimArray:
    gid = grouper.group_of_step(da.time)
    ax = da.time_axis
    sc = jnp.take(scaling, jnp.asarray(gid), axis=0)  # (T, ...)
    sc = jnp.moveaxis(sc, 0, ax)
    out = _apply_kind(jnp.moveaxis(da.data, ax, ax), sc, kind)
    res = da.copy(data=out)
    return res


# ---------------------------------------------------------------------------
# ExtremeValues: GPD-based second-pass correction of the far tail
# ---------------------------------------------------------------------------


def _gpd_fit_lmom(y, axis):
    """Generalized-Pareto (location 0) L-moment fit of exceedances.

    Hosking parameterization F(y) = 1 − (1 − k·y/σ)^(1/k); k = λ1/λ2 − 2,
    σ = λ1(1+k). NaN-aware along `axis`."""
    from xclim_tpu.indices.stats import _lmoments

    l1, l2, _, n = _lmoments(y, axis)
    k = l1 / jnp.where(l2 == 0, jnp.nan, l2) - 2.0
    sigma = l1 * (1 + k)
    return k, sigma, n


def _gpd_cdf(y, k, sigma):
    s = jnp.where(sigma <= 0, jnp.nan, sigma)
    z = y / s
    small = jnp.abs(k) < 1e-6
    arg = jnp.maximum(1 - k * z, 1e-12)
    gen = 1 - arg ** (1 / jnp.where(small, 1.0, k))
    expo = 1 - jnp.exp(-z)
    out = jnp.where(small, expo, gen)
    return jnp.clip(jnp.where(y <= 0, 0.0, out), 0.0, 1.0)


def _gpd_ppf(p, k, sigma):
    s = jnp.where(sigma <= 0, jnp.nan, sigma)
    small = jnp.abs(k) < 1e-6
    pc = jnp.clip(p, 1e-9, 1 - 1e-9)
    gen = s / jnp.where(small, 1.0, k) * (1 - (1 - pc) ** k)
    expo = -s * jnp.log(1 - pc)
    return jnp.where(small, expo, gen)


def _cluster_maxima(xf, u):
    """Per-lane maxima of runs of ``x > u``.

    xf: (T, C) time-major; returns (C, E) cluster maxima, NaN padded
    (E = T//2 + 1, the worst case of alternating exceedances)."""
    import jax

    T, C = xf.shape
    E = T // 2 + 1
    above = xf > u
    prev = jnp.concatenate([jnp.zeros_like(above[:1]), above[:-1]], axis=0)
    starts = above & ~prev
    eid = jnp.cumsum(starts.astype(jnp.int32), axis=0) - 1
    cell = jnp.arange(C, dtype=jnp.int32)[None, :]
    ids = jnp.where(above & (eid < E), cell * E + jnp.clip(eid, 0, E - 1),
                    C * E).reshape(-1)
    vals = jnp.where(above, xf, -jnp.inf).reshape(-1)
    mx = jax.ops.segment_max(vals, ids, num_segments=C * E + 1)[:-1]
    mx = mx.reshape(C, E)
    return jnp.where(jnp.isinf(mx), jnp.nan, mx)


@functools.partial(jax.jit, static_argnames=("u", "q_thresh"))
def _ev_train_core(xf2, *, u, q_thresh):
    """Declustered POT + L-moment GPD fit as one program (eager ops paid
    a ~30 ms tunnel dispatch floor each)."""
    from xclim_tpu.ops.quantile import nan_quantile

    cm = _cluster_maxima(xf2, u)  # (C, E)
    th = nan_quantile(cm.T, jnp.asarray([q_thresh]), axis=0)[0]  # (C,)
    exc = jnp.where(cm > th[:, None], cm - th[:, None], jnp.nan)
    k, s, n = _gpd_fit_lmom(exc, axis=-1)
    return k, s, n, th


@functools.partial(jax.jit, static_argnames=("frac", "power"))
def _ev_adjust_core(x, scen, th_h, th_r, k_h, s_h, k_r, s_r, *, frac,
                    power):
    y = jnp.maximum(x - th_h, 0.0)
    ph = _gpd_cdf(y, k_h, s_h)
    transformed = th_r + _gpd_ppf(ph, k_r, s_r)
    # weight: 0 until the (1-frac) exceedance probability of the POT
    # level, ramping to 1 for the most extreme values
    w = jnp.clip((ph - (1 - frac)) / frac, 0.0, 1.0) ** power
    w = jnp.where(x > th_h, w, 0.0)
    valid = ~jnp.isnan(transformed)
    return jnp.where(valid, (1 - w) * scen + w * transformed, scen)


class ExtremeValues(TrainAdjust):
    """Second-order adjustment of extreme values via Generalized-Pareto
    transfer (xsdba.ExtremeValues; Roy et al. 2023 method family).

    The reference (the external xsdba package) fits a GenPareto distribution
    to the maxima of exceedance clusters over ``cluster_thresh`` in ref and
    hist; at adjust time, values of sim above the threshold are mapped
    through ``GPD_ref⁻¹ ∘ GPD_hist`` and blended with the scen produced by a
    first-pass method, with a weight growing from 0 at the threshold to 1 at
    the most extreme values.

    train: cluster maxima (one max per run of consecutive exceedances of
    ``cluster_thresh`` — the declustering step), a per-cell peaks-over-
    threshold level at the ``q_thresh`` quantile of those maxima, then
    L-moment GPD fits of the exceedances over that level.
    adjust(scen, sim, frac, power): sim extremes above hist's POT level map
    through ``thresh_ref + GPD_ref⁻¹(GPD_hist(sim − thresh_hist))`` with
    weight = (clip(F_hist − (1 − frac), 0, frac)/frac)^power.
    """

    @classmethod
    def _train(cls, ref, hist, *, cluster_thresh="1 mm/d",
               q_thresh: float = 0.95, group="time"):
        u = convert_units_to(str2pint(cluster_thresh), ref) \
            if isinstance(cluster_thresh, str) else float(cluster_thresh)
        gr = group if isinstance(group, Grouper) else Grouper(group)

        def fit_one(da):
            ax = da.time_axis
            xf = jnp.moveaxis(da.data, ax, 0)
            shp = xf.shape[1:]
            xf2 = xf.reshape(xf.shape[0], -1)
            k, s, n, th = _ev_train_core(xf2, u=float(u),
                                         q_thresh=float(q_thresh))
            rs = (lambda a: a.reshape(shp)) if shp else (lambda a: a[0])
            return rs(k), rs(s), rs(n), rs(th)

        kr, sr, nr, thr = fit_one(ref)
        kh, sh, nh, thh = fit_one(hist)
        return cls({"k_ref": kr, "s_ref": sr, "k_hist": kh, "s_hist": sh,
                    "n_ref": nr, "n_hist": nh,
                    "thresh_ref": thr, "thresh_hist": thh},
                   group=gr, kind="+", cluster_thresh=u)

    def _adjust(self, sim: ClimArray, scen: ClimArray = None,
                frac: float = 0.25, power: float = 1.0):
        if scen is None:
            scen = sim
        out = _ev_adjust_core(sim.data, scen.data, self.ds["thresh_hist"],
                              self.ds["thresh_ref"], self.ds["k_hist"],
                              self.ds["s_hist"], self.ds["k_ref"],
                              self.ds["s_ref"], frac=float(frac),
                              power=float(power))
        res = scen.copy(data=out)
        res.attrs = dict(scen.attrs)
        return res

    def adjust(self, scen: ClimArray, sim: ClimArray, frac: float = 0.25,
               power: float = 1.0):
        """Blend a first-pass scen with GPD-transferred sim extremes
        (signature per the reference: adjust(scen, sim, frac, power))."""
        sim = convert_units_to(sim, self.train_units, context="infer")
        scen = convert_units_to(scen, self.train_units, context="infer")
        out = self._adjust(sim, scen=scen, frac=frac, power=power)
        out.attrs["units"] = self.train_units
        hist_line = (scen.attrs.get("history", "") +
                     "\nExtreme values adjusted with ExtremeValues "
                     f"(cluster_thresh={self.cluster_thresh}, frac={frac}, "
                     f"power={power}).")
        out.attrs["history"] = hist_line
        return out


# ---------------------------------------------------------------------------
# N-dimensional pdf transfer (MBCn core; Cannon 2018)
# ---------------------------------------------------------------------------


def random_rotation_matrices(key, n_iter: int, nvar: int):
    """Uniform random orthogonal matrices via QR of gaussians
    (xsdba utils.rand_rot_matrix)."""
    import jax

    def one(k):
        a = jax.random.normal(k, (nvar, nvar))
        qm, r = jnp.linalg.qr(a)
        # sign-correct for a proper Haar draw
        return qm * jnp.sign(jnp.diag(r))[None, :]

    keys = jax.random.split(key, n_iter)
    return jnp.stack([one(k) for k in keys])


def npdf_transform(ref: ClimArray, hist: ClimArray, sim: ClimArray = None,
                   *, n_iter: int = 20, nquantiles: int = 50, key=None,
                   base=None, return_escores: bool = False):
    """N-dimensional pdf transfer: iterative random rotations + 1-D quantile
    mapping (the core of MBCn, Cannon 2018; xsdba.NpdfTransform).

    ref, hist, sim: stacked ``(multivar, time)`` ClimArrays (see
    :func:`xclim_tpu.sdba.processing.stack_variables`); inputs should be
    standardized (the algorithm works in an additive space). Each iteration
    draws an orthogonal rotation, quantile-maps every rotated coordinate of
    hist (and sim) onto rotated ref with the `base` method (default QDM,
    additive), and rotates back. Returns (hist_adj, sim_adj[, escores]).

    Downstream, the usual MBCn recipe reorders a univariately-adjusted scen
    by the ranks of sim_adj (:func:`xclim_tpu.sdba.processing.reordering`).
    """
    import jax

    from xclim_tpu.sdba.processing import escore as _escore

    if key is None:
        key = jax.random.PRNGKey(0)
    if base is None:
        base = QuantileDeltaMapping
    nvar = ref.shape[0]
    rots = random_rotation_matrices(key, n_iter, nvar)

    rdat = ref.data
    hdat = hist.data
    sdat = sim.data if sim is not None else None
    escores = []

    def _mat(mat, time):
        # (nvar, T) -> one (T, nvar) array: every rotated coordinate is a
        # lane of the same quantile-mapping program instead of a separate
        # eager train/adjust per variable (the tunnel backend charges a
        # ~30 ms dispatch floor per eager op)
        return ClimArray(mat.T, ("time", "multivar"), {"time": time},
                         {"units": ""}, "v")

    for i in range(n_iter):
        R = rots[i]
        r_r = R @ rdat
        h_r = R @ hdat
        s_r = R @ sdat if sdat is not None else None
        adj = base.train(_mat(r_r, ref.time), _mat(h_r, hist.time),
                         group="time", nquantiles=nquantiles, kind="+")
        h_new = adj.adjust(_mat(h_r, hist.time)).data.T  # (nvar, T)
        hdat = R.T @ h_new
        if s_r is not None:
            s_new = adj.adjust(_mat(s_r, sim.time)).data.T
            sdat = R.T @ s_new
        if return_escores:
            escores.append(_escore(ref, hist.copy(data=hdat), N=500))

    hist_adj = hist.copy(data=hdat)
    hist_adj.attrs = dict(hist.attrs)
    sim_adj = None
    if sim is not None:
        sim_adj = sim.copy(data=sdat)
        sim_adj.attrs = dict(sim.attrs)
    if return_escores:
        return hist_adj, sim_adj, escores
    return hist_adj, sim_adj


# ---------------------------------------------------------------------------
# trained-state persistence (SURVEY §5 checkpoint/resume: "trained adjustment
# datasets Adj.ds ... keep these as explicit, serializable state objects")
# ---------------------------------------------------------------------------


def _save_trained(obj: TrainAdjust, path):
    """Serialize a trained adjustment object to ``.npz``.

    Metadata travels as a JSON string in a unicode array — never pickled —
    so checkpoints load with ``allow_pickle=False`` (untrusted checkpoint
    files are not a code-execution vector; the reference likewise stores
    trained state as plain datasets)."""
    import json

    meta = {"__class__": type(obj).__name__,
            "__group__": obj.group.group,
            "__window__": obj.group.window,
            "__kind__": getattr(obj, "kind", "+"),
            "__train_units__": getattr(obj, "train_units", "")}
    extra = {}
    for attr in ("thresh", "cluster_thresh"):
        if hasattr(obj, attr):
            extra[f"__{attr}__"] = np.float64(getattr(obj, attr))
    arrays = {k: np.asarray(v) for k, v in obj.ds.items()}
    np.savez(path, __meta__=np.array(json.dumps(meta)),
             **extra, **arrays)


def _load_trained(path):
    """Load a trained adjustment object saved with ``.save()``."""
    import json

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"][()]))
    cls = {c.__name__: c for c in
           (EmpiricalQuantileMapping, DetrendedQuantileMapping,
            QuantileDeltaMapping, Scaling, LOCI,
            ExtremeValues)}[meta["__class__"]]
    ds = {}
    params = {"group": Grouper(meta["__group__"], meta["__window__"]),
              "kind": meta["__kind__"]}
    for k in data.files:
        if k == "__meta__":
            continue
        if k.startswith("__") and k.endswith("__"):
            params[k.strip("_")] = float(data[k])
        else:
            ds[k] = jnp.asarray(data[k])
    obj = cls(ds, **params)
    obj.train_units = meta["__train_units__"]
    return obj


TrainAdjust.save = _save_trained
TrainAdjust.load = classmethod(lambda cls, path: _load_trained(path))
