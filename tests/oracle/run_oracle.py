"""Run the reference iS3D2 binary (compiled against the GSL shim) in a sandbox
directory to produce golden outputs for validation tests.

The sandbox links the reference's data assets (PDG lists, quadrature tables,
delta-f coefficient tables), writes a generated parameter file and surface,
and invokes the oracle binary.  Results land in <sandbox>/results/.
"""

from __future__ import annotations

import os
import subprocess
from pathlib import Path

REF = Path(os.environ.get("IS3D2_REFERENCE", "/root/reference"))
HERE = Path(__file__).parent
ORACLE_BIN = HERE / "build" / "iS3D_oracle"

_PARAM_KEYS = [
    "operation", "mode", "hrg_eos", "dimension", "df_mode",
    "include_baryon", "include_bulk_deltaf", "include_shear_deltaf",
    "include_baryondiff_deltaf", "regulate_deltaf", "outflow", "deta_min",
    "mass_pion0", "threads_per_block", "chunk_size", "oversample", "fast",
    "y_cut", "min_num_hadrons", "max_num_samples", "sampler_seed",
    "test_sampler", "pT_min", "pT_max", "pT_bins", "y_bins", "phip_bins",
    "eta_cut", "eta_bins", "tau_min", "tau_max", "tau_bins", "r_min",
    "r_max", "r_bins", "group_particles", "particle_diff_tolerance",
    "do_resonance_decays", "lightest_particle",
]

_DEFAULTS = {
    "operation": 1, "mode": 1, "hrg_eos": 3, "dimension": 2, "df_mode": 1,
    "include_baryon": 0, "include_bulk_deltaf": 1, "include_shear_deltaf": 1,
    "include_baryondiff_deltaf": 0, "regulate_deltaf": 0, "outflow": 0,
    "deta_min": 1.0e-5, "mass_pion0": 0.138, "threads_per_block": 128,
    "chunk_size": 128, "oversample": 1, "fast": 1, "y_cut": 5.0,
    "min_num_hadrons": 1.0e5, "max_num_samples": 100, "sampler_seed": 1,
    "test_sampler": 1, "pT_min": 0.0, "pT_max": 3.0, "pT_bins": 100,
    "y_bins": 100, "phip_bins": 100, "eta_cut": 7.0, "eta_bins": 140,
    "tau_min": 0.0, "tau_max": 12.0, "tau_bins": 120, "r_min": 0.0,
    "r_max": 12.0, "r_bins": 60, "group_particles": 0,
    "particle_diff_tolerance": 0.01, "do_resonance_decays": 0,
    "lightest_particle": 111,
}


def ensure_oracle_built() -> Path:
    if not ORACLE_BIN.exists():
        subprocess.run(["bash", str(HERE / "build_oracle.sh")], check=True,
                       capture_output=True)
    return ORACLE_BIN


def setup_sandbox(sandbox: Path, params: dict, surface_file: Path,
                  chosen_mcids=(111, 321, 2212)) -> Path:
    sandbox.mkdir(parents=True, exist_ok=True)

    merged = dict(_DEFAULTS)
    merged.update(params)
    lines = [f"{k} = {merged[k]}" for k in _PARAM_KEYS]
    (sandbox / "iS3D_parameters.dat").write_text("\n".join(lines) + "\n")

    # PDG dir: link pdg files, write custom chosen_particles.dat
    pdg = sandbox / "PDG"
    pdg.mkdir(exist_ok=True)
    for f in REF.glob("PDG/pdg*"):
        dst = pdg / f.name
        if not dst.exists():
            dst.symlink_to(f)
    (pdg / "chosen_particles.dat").write_text(
        "\n".join(str(m) for m in chosen_mcids) + "\n")

    # tables: REAL directories with per-file symlinks (never symlink the
    # directory itself -- a test replacing e.g. phi_table.dat would then
    # write straight into the read-only reference tree), plus a writable
    # thermodynamic/
    tables = sandbox / "tables"
    tables.mkdir(exist_ok=True)
    for sub in ("momentum", "spacetime_rapidity", "gauss"):
        dst = tables / sub
        if dst.is_symlink():
            dst.unlink()
        dst.mkdir(exist_ok=True)
        for f in (REF / "tables" / sub).iterdir():
            link = dst / f.name
            if not link.exists():
                link.symlink_to(f)
    (tables / "thermodynamic").mkdir(exist_ok=True)

    dfc = sandbox / "deltaf_coefficients"
    if not dfc.exists():
        dfc.symlink_to(REF / "deltaf_coefficients")

    inp = sandbox / "input"
    inp.mkdir(exist_ok=True)
    dst = inp / "surface.dat"
    if dst.exists() or dst.is_symlink():
        dst.unlink()
    dst.symlink_to(surface_file)

    results = sandbox / "results"
    for sub in ("continuous", "sampled/dN_dy", "sampled/dN_deta",
                "sampled/dN_2pipTdpTdy", "sampled/dN_dphipdy", "sampled/vn",
                "sampled/dN_taudtaudy", "sampled/dN_2pirdrdy",
                "sampled/dN_dphisdy"):
        (results / sub).mkdir(parents=True, exist_ok=True)
    return sandbox


def run_oracle(sandbox: Path, timeout: int = 600) -> subprocess.CompletedProcess:
    ensure_oracle_built()
    return subprocess.run([str(ORACLE_BIN)], cwd=sandbox, check=True,
                          capture_output=True, text=True, timeout=timeout)
