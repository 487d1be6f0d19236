"""The browser UIs are endpoint-driven: every /api/... URL the embedded
page JS fetches must be routed by its module's HTTP handler (GET or
POST). No browser runs in CI, so this static audit is what catches a
renamed handler route leaving the UI silently broken."""

import re

MODULES = {
    "gt_editor": "lecturemath_tpu/utils/gt_editor.py",
    "annotation_editor": "lecturemath_tpu/utils/annotation_editor.py",
    "word_editor": "lecturemath_tpu/utils/word_editor.py",
    "st3d_visualizer": "lecturemath_tpu/utils/st3d_visualizer.py",
}


def _audit(path):
    import os

    src = open(os.path.join(os.path.dirname(__file__), "..", path)).read()
    page = re.search(r'PAGE = """(.*?)"""', src, re.S).group(1)
    # endpoints the JS fetches; template-interpolated suffixes ("/api/x/"
    # + idx) appear with a trailing slash — normalize to the route prefix
    js_endpoints = {e.split("$")[0].rstrip("/")
                    for e in re.findall(r"/api/[A-Za-z0-9_/${}]+", page)}
    handler = src[src.index("def make_handler"):]
    routed = {r.rstrip("/") for r in
              re.findall(r'startswith\("(/api/[A-Za-z0-9_/]+)"\)', handler)}
    # word_editor routes POST /api/<tool>/<op> generically
    generic = 'parts[0] != "api"' in handler
    return js_endpoints, routed, generic


def test_every_js_endpoint_is_routed():
    for name, path in MODULES.items():
        js_endpoints, routed, generic = _audit(path)
        assert js_endpoints, f"{name}: no endpoints extracted (regex rot?)"
        for endpoint in js_endpoints:
            if generic and re.fullmatch(r"/api/\w+/\w+", endpoint):
                continue
            assert endpoint in routed, \
                f"{name}: page JS fetches {endpoint} but the handler " \
                f"does not route it"
