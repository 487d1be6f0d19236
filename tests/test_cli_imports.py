"""Every CLI module imports cleanly and every drop-in wrapper compiles."""

import importlib
import os
import py_compile

import pytest

CLI_MODULES = [
    "binarize", "cc_analysis", "cc_grouping", "vid_segmentation",
    "generate_summary", "eval_summaries", "eval_segments",
    "eval_text_detector", "train_reconstruction", "train_text_detector",
    "train_binarizer", "prepare_text_masks", "prepare_cocotext",
    "validate_dataset", "binarize_image", "vis_gt_intervals",
    "gt_editor", "annotation_editor", "run_pipeline", "serve",
    "st3d_visualizer", "export_video", "doctor",
]


@pytest.mark.parametrize("name", CLI_MODULES)
def test_cli_module_imports(name):
    module = importlib.import_module(f"lecturemath_tpu.cli.{name}")
    assert callable(module.main)


def test_wrapper_scripts_compile():
    scripts_dir = os.path.join(os.path.dirname(__file__), "..", "scripts")
    wrappers = [f for f in os.listdir(scripts_dir) if f.endswith(".py")]
    assert len(wrappers) >= 17
    for name in wrappers:
        py_compile.compile(os.path.join(scripts_dir, name), doraise=True)


def test_usage_output(capsys):
    from lecturemath_tpu.cli import cc_analysis

    cc_analysis.main(["prog"])
    out = capsys.readouterr().out
    assert "Usage" in out


def test_console_script_entry_points_resolve():
    """Every [project.scripts] target in pyproject.toml must import and be
    callable (a rename would break installed console scripts silently)."""
    import re

    pyproject = open(os.path.join(os.path.dirname(__file__), "..",
                                  "pyproject.toml")).read()
    targets = re.findall(r'^\S+ = "(lecturemath_tpu[\w.]+):(\w+)"',
                         pyproject, re.M)
    assert len(targets) >= 10
    for module_name, attr in targets:
        module = importlib.import_module(module_name)
        assert callable(getattr(module, attr)), (module_name, attr)
