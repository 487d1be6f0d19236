"""The shipped annotated config (configs/example.conf) must stay true:
every key it documents is actually read by the package, it parses
cleanly, and its model section reproduces the production architecture."""

import os
import re

from lecturemath_tpu.core.config import Config
from lecturemath_tpu.models.fcn_lecturenet import FCNConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONF = os.path.join(REPO, "configs", "example.conf")


def _package_source():
    chunks = []
    for root, _, files in os.walk(os.path.join(REPO, "lecturemath_tpu")):
        for name in files:
            if name.endswith(".py"):
                with open(os.path.join(root, name)) as fh:
                    chunks.append(fh.read())
    return "\n".join(chunks)


def test_example_config_parses_completely():
    config = Config.from_file(CONF)
    file_keys = re.findall(r"^([A-Z][A-Z0-9_]+) =", open(CONF).read(), re.M)
    assert len(file_keys) >= 60
    for key in file_keys:
        assert config.get(key) is not None, f"{key} dropped by the parser"


def test_every_documented_key_is_read_by_the_package():
    source = _package_source()
    file_keys = re.findall(r"^#? ?([A-Z][A-Z0-9_]+) =", open(CONF).read(),
                           re.M)
    assert "TPU_MESH" in file_keys      # commented example keys count too
    for key in file_keys:
        if key in source:
            continue
        # numbered families are read via f-strings ("..._FILTERS_{i}")
        prefix = re.sub(r"_\d+$", "_", key)
        assert prefix in source, f"{key} documented but never read"


def test_example_model_section_is_the_production_net():
    config = Config.from_file(CONF)
    assert FCNConfig.from_config(config) == FCNConfig()
