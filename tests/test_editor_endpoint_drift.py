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


def _page(path):
    import os

    src = open(os.path.join(os.path.dirname(__file__), "..", path)).read()
    return re.search(r'PAGE = """(.*?)"""', src, re.S).group(1)


def test_every_dom_id_the_js_touches_exists():
    """Companion audit for the DOM side: every element id the page JS
    looks up must be defined — statically in the HTML (id="x"), or by the
    JS itself (el.id = 'x' / createElement then .id assignment). A renamed
    HTML id with a stale getElementById leaves a dead control that no
    HTTP-level test can see."""
    for name, path in MODULES.items():
        page = _page(path)
        looked_up = set(re.findall(
            r"""getElementById\(\s*['"]([\w-]+)['"]\s*\)""", page))
        assert looked_up, f"{name}: no getElementById calls found"
        defined = set(re.findall(r"""\bid=["']([\w-]+)["']""", page))
        defined |= set(re.findall(r"""\.id\s*=\s*['"]([\w-]+)['"]""", page))
        missing = looked_up - defined
        assert not missing, \
            f"{name}: page JS references missing DOM id(s) {sorted(missing)}"


def test_every_img_route_the_js_uses_is_served():
    """The pages also load /img/... URLs (canvas layers, previews); a
    renamed image route 404s silently in the browser. Audit them against
    the handler's GET routing the same way as /api/."""
    import os

    for name, path in MODULES.items():
        src = open(os.path.join(os.path.dirname(__file__), "..", path)).read()
        page = re.search(r'PAGE = """(.*?)"""', src, re.S).group(1)
        js_imgs = {e.split("$")[0].rstrip("/")
                   for e in re.findall(r"/img/[A-Za-z0-9_/${}]+", page)}
        if not js_imgs:
            continue
        handler = src[src.index("def make_handler"):]
        routed = set()
        for tup in re.findall(r'startswith\(\(([^)]*)\)\)', handler):
            routed |= {r.rstrip("/") for r in
                       re.findall(r'"(/img/[A-Za-z0-9_/]+)"', tup)}
        routed |= {r.rstrip("/") for r in
                   re.findall(r'startswith\("(/img/[A-Za-z0-9_/]+)"\)',
                              handler)}
        for img in js_imgs:
            assert any(img == r or img.startswith(r + "/") or r.startswith(img)
                       for r in routed), \
                f"{name}: page JS loads {img} but the handler serves no " \
                f"matching /img route"
