"""Sampler-test histogram binning (test_sampler = 1).

Replaces BinSampledParticle.cpp:9-133 + the event-averaged writers
(EmissionFunction.cpp:685-975) with vectorized segment sums over the flat
hadron axis.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..constants import two_pi

K_MAX = 7  # v1..v7 (EmissionFunction.h:102)


@dataclasses.dataclass
class SampledHistograms:
    """Raw bin counts (event averaging happens in the writers)."""

    n_events: int
    dN_dy: np.ndarray             # (S, y_bins)
    dN_deta: np.ndarray           # (S, eta_bins)
    dN_2pipTdpTdy: np.ndarray     # (S, pT_bins)
    dN_dphipdy: np.ndarray        # (S, phip_bins)
    pT_count: np.ndarray          # (S, pT_bins)
    vn_real: np.ndarray           # (K_MAX, S, pT_bins)
    vn_imag: np.ndarray
    dN_taudtaudy: np.ndarray      # (S, tau_bins)
    dN_2pirdrdy: np.ndarray       # (S, r_bins)
    dN_dphisdy: np.ndarray        # (S, phip_bins)


def _hist(sp_idx, values, lo, width, nbins, S, keep, weights=None):
    """Per-species histogram via one flat scatter-add."""
    ib = jnp.floor((values - lo) / width).astype(jnp.int32)
    ok = keep & (ib >= 0) & (ib < nbins)
    flat = sp_idx * nbins + jnp.clip(ib, 0, nbins - 1)
    w = jnp.where(ok, 1.0 if weights is None else weights, 0.0)
    out = jnp.zeros(S * nbins)
    return out.at[flat].add(w).reshape(S, nbins)


def bin_histograms_device(out: dict, S: int, cfg: Config) -> dict:
    """Jittable full histogram set over the flat hadron axis -> dict of jnp
    arrays.  Shared by the single-chip binner and the event-sharded sampler
    (the psum'd analog of the reference's per-process histogram files)."""
    keep = out["keep"]
    sp = out["sp_idx"]

    y_w = 2.0 * cfg.y_cut / cfg.y_bins
    eta_w = 2.0 * cfg.eta_cut / cfg.eta_bins
    pT_w = (cfg.pT_max - cfg.pT_min) / cfg.pT_bins
    phip_w = two_pi / cfg.phip_bins
    tau_w = (cfg.tau_max - cfg.tau_min) / cfg.tau_bins
    r_w = (cfg.r_max - cfg.r_min) / cfg.r_bins

    pT = jnp.sqrt(out["px"] ** 2 + out["py"] ** 2)
    phip = jnp.arctan2(out["py"], out["px"])
    phip = jnp.where(phip < 0.0, phip + two_pi, phip)
    r = jnp.sqrt(out["x"] ** 2 + out["y"] ** 2)
    phis = jnp.arctan2(out["y"], out["x"])
    phis = jnp.where(phis < 0.0, phis + two_pi, phis)

    dN_dy = _hist(sp, out["rapidity"], -cfg.y_cut, y_w, cfg.y_bins, S, keep)
    dN_deta = _hist(sp, out["eta"], -cfg.eta_cut, eta_w, cfg.eta_bins, S, keep)
    dN_pT = _hist(sp, pT, cfg.pT_min, pT_w, cfg.pT_bins, S, keep)
    dN_phip = _hist(sp, phip, 0.0, phip_w, cfg.phip_bins, S, keep)
    dN_tau = _hist(sp, out["tau"], cfg.tau_min, tau_w, cfg.tau_bins, S, keep)
    dN_r = _hist(sp, r, cfg.r_min, r_w, cfg.r_bins, S, keep)
    dN_phis = _hist(sp, phis, 0.0, phip_w, cfg.phip_bins, S, keep)

    pT_count = dN_pT  # same binning/counts (BinSampledParticle.cpp:85-90)
    vn_real = []
    vn_imag = []
    for k in range(1, K_MAX + 1):
        vn_real.append(_hist(sp, pT, cfg.pT_min, pT_w, cfg.pT_bins, S, keep,
                             weights=jnp.cos(k * phip)))
        vn_imag.append(_hist(sp, pT, cfg.pT_min, pT_w, cfg.pT_bins, S, keep,
                             weights=jnp.sin(k * phip)))

    return {
        "dN_dy": dN_dy,
        "dN_deta": dN_deta,
        "dN_2pipTdpTdy": dN_pT,
        "dN_dphipdy": dN_phip,
        "pT_count": pT_count,
        "vn_real": jnp.stack(vn_real),
        "vn_imag": jnp.stack(vn_imag),
        "dN_taudtaudy": dN_tau,
        "dN_2pirdrdy": dN_r,
        "dN_dphisdy": dN_phis,
    }


@partial(jax.jit, static_argnames=("S", "cfg"))
def _bin_histograms_jit(out: dict, S: int, cfg: Config) -> dict:
    return bin_histograms_device(out, S, cfg)


_BIN_KEYS = ("keep", "sp_idx", "px", "py", "x", "y", "rapidity", "eta", "tau")


def bin_sampled_particles(out: dict, S: int, cfg: Config,
                          n_events: int) -> SampledHistograms:
    # one compiled program: eager dispatch of the ~21 scatter-adds costs a
    # device round-trip each on the remote-TPU tunnel
    h = _bin_histograms_jit({k: out[k] for k in _BIN_KEYS}, S, cfg)
    return SampledHistograms(
        n_events=n_events,
        **{k: np.asarray(v) for k, v in h.items()})


class ChunkBinner:
    """Streaming histogram accumulator for sample_particles'
    ``chunk_consumer``: bins each finalized chunk on device (bucketed chunk
    pads reuse one compiled program) and sums -- the campaign-wide hadron
    axis is never concatenated or transferred."""

    def __init__(self, S: int, cfg: Config):
        self.S, self.cfg = S, cfg
        self._acc = None

    def __call__(self, chunk: dict) -> None:
        h = _bin_histograms_jit({k: chunk[k] for k in _BIN_KEYS},
                                self.S, self.cfg)
        if self._acc is None:
            self._acc = h
        else:
            self._acc = jax.tree_util.tree_map(jnp.add, self._acc, h)

    def result(self, n_events: int) -> SampledHistograms:
        return SampledHistograms(
            n_events=n_events,
            **{k: np.asarray(v) for k, v in self._acc.items()})
