"""Fortran-binding ABI parity (VERDICT r2 item 10).

The image ships no gfortran, so the F90 module cannot be compiled here;
instead this guards the ABI the module binds against: every
``bind(C, name="...")`` symbol declared in bindings/superlu_tpu_mod.f90
must be exported by the compiled C bridge shared library, with no silent
drift between the two surfaces (the role of the reference's CI-compiled
FORTRAN/superlu_c2f_dwrap.c:142-156 wrappers).
"""

import os
import re
import subprocess

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _declared_symbols():
    src = os.path.join(_REPO, "bindings", "superlu_tpu_mod.f90")
    with open(src) as f:
        text = f.read()
    syms = re.findall(r'bind\(\s*C\s*,\s*name\s*=\s*"([^"]+)"\s*\)', text,
                      flags=re.IGNORECASE)
    assert syms, "no bind(C) declarations found in superlu_tpu_mod.f90"
    return sorted(set(syms))


def test_f90_symbols_exported_by_bridge():
    from superlu_dist_tpu.utils import cbridge
    so = cbridge.build_bridge()
    out = subprocess.run(["nm", "-D", "--defined-only", so],
                         check=True, capture_output=True, text=True).stdout
    exported = {line.split()[-1] for line in out.splitlines() if line}
    missing = [s for s in _declared_symbols() if s not in exported]
    assert not missing, (
        f"F90 module binds symbols the C bridge does not export: {missing}")


def test_f90_symbols_in_public_header():
    """Each bound symbol must also appear in the public C header, so the
    three surfaces (F90 module, header, .so) describe one ABI."""
    from superlu_dist_tpu.utils import cbridge
    with open(cbridge.bridge_header()) as f:
        header = f.read()
    missing = [s for s in _declared_symbols() if s not in header]
    assert not missing, f"symbols absent from superlu_dist_tpu.h: {missing}"


def test_f90_driver_uses_only_declared_symbols():
    """f_drive.F90 must not call bridge symbols the module doesn't bind."""
    src = os.path.join(_REPO, "bindings", "f_drive.F90")
    with open(src) as f:
        text = f.read()
    used = set(re.findall(r"\bslu_tpu_\w+", text))
    declared = set(_declared_symbols())
    # the F90-side wrapper names equal the C names here by design
    undeclared = sorted(u for u in used if u not in declared)
    assert not undeclared, f"f_drive.F90 calls unbound symbols: {undeclared}"


def test_gfortran_compile_if_available():
    """If a Fortran compiler ever lands in the image, actually compile the
    module + driver against the bridge."""
    import shutil
    fc = shutil.which("gfortran") or shutil.which("flang")
    if fc is None:
        pytest.skip("no Fortran compiler in image")
    from superlu_dist_tpu.utils import cbridge
    so = cbridge.build_bridge()
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        subprocess.run(
            [fc, "-c", os.path.join(_REPO, "bindings",
                                    "superlu_tpu_mod.f90")],
            check=True, cwd=td, capture_output=True)
        subprocess.run(
            [fc, os.path.join(_REPO, "bindings", "f_drive.F90"),
             "superlu_tpu_mod.o", so, "-o", "f_drive"],
            check=True, cwd=td, capture_output=True)
