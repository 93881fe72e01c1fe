"""GRACKLE_INFO-analogue dump and verbose parameter printing
(reference: initialize_chemistry_data.c:203-274)."""

import io
import os

from grackle_tpu import info as ginfo
from grackle_tpu.api import ChemistryData
from grackle_tpu.config import PARAMETER_REGISTRY
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs


def _chem(**kw):
    cd = ChemistryData()
    cd.use_grackle = 1
    cd.primordial_chemistry = 1
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    for k, v in kw.items():
        setattr(cd, k, v)
    assert cd.initialize() == 1
    return cd


def test_info_file_contains_every_parameter(tmp_path):
    cd = _chem()
    path = str(tmp_path / "GRACKLE_TPU_INFO")
    ginfo.write_info_file(cd.context.config, cd.context.units, path)
    assert os.path.exists(path)
    text = open(path).read()
    assert "grackle_tpu version:" in text
    assert "== units ==" in text
    for name in PARAMETER_REGISTRY:
        assert name in text, f"parameter {name} missing from info dump"
    for name in ["density_units", "length_units", "time_units",
                 "a_units", "a_value", "comoving_coordinates"]:
        assert name in text


def test_info_file_reflects_non_default_values(tmp_path):
    cd = _chem(primordial_chemistry=2, Gamma=1.4)
    path = str(tmp_path / "info")
    ginfo.write_info_file(cd.context.config, cd.context.units, path)
    text = open(path).read()
    assert "primordial_chemistry" in text
    line = [ln for ln in text.splitlines()
            if ln.startswith("primordial_chemistry")][0]
    assert "2" in line
    line = [ln for ln in text.splitlines() if ln.startswith("Gamma")][0]
    assert "1.4" in line


def test_show_parameters_prints_all():
    cd = _chem()
    buf = io.StringIO()
    ginfo.show_parameters(cd.context.config, buf)
    out = buf.getvalue()
    for name in PARAMETER_REGISTRY:
        assert name in out


def test_verbose_initialize_writes_info(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    ginfo.set_verbose(True)
    try:
        _chem()
    finally:
        ginfo.set_verbose(False)
    assert os.path.exists(tmp_path / "GRACKLE_TPU_INFO")


def test_get_grackle_version():
    """Version struct (analogue of test_get_grackle_version.py)."""
    from grackle_tpu.version import get_grackle_version

    v = get_grackle_version()
    assert v.version
    assert [int(x) for x in v.version.split(".")]
    assert isinstance(v.branch, str)
    assert isinstance(v.revision, str)
