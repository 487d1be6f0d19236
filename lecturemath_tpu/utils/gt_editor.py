"""Minimal interactive ground-truth editor: pixel paint/erase and
portion accept/reject over a GT annotation tree, with a local-browser
canvas UI.

This is the launchable equivalent of the reference's interactive pixel
annotators (reference: AccessMath/annotation/gt_pixel_binary_annotator.py:1
— 1,569 LoC pygame paint loop — and gt_binary_annotator.py:1, 1,778 LoC):
view a keyframe, paint/erase binary pixels, reject content portions, and
save the SAME XML/PNG tree the reference GUIs and our
eval/gt_authoring.export_gt_tree write (segments.xml is left untouched;
binary/, portions/, portions.xml, and unique_ccs.xml are rewritten).

The edit loop is a headless-testable session object (GTEditorSession); the
UI is a thin stdlib HTTP server + embedded canvas page (`serve`), launched
via ``python -m lecturemath_tpu.cli.gt_editor <config> -l <lecture>``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


class GTEditorSession:
    """Load-edit-save loop over one lecture's GT annotation tree
    (<annotations>/<DB>_<lecture>/)."""

    def __init__(self, tree_prefix: str):
        import cv2

        from ..eval.annotation import KeyframeAnnotation

        self.prefix = tree_prefix
        xml_path = os.path.join(tree_prefix, "segments.xml")
        self.keyframes = KeyframeAnnotation.load_exported_keyframes(
            xml_path, os.path.join(tree_prefix, "keyframes") + "/", False)
        if not self.keyframes:
            raise ValueError(f"no keyframes in {xml_path}")

        self._binaries: Dict[int, np.ndarray] = {}
        self._undo: Dict[int, List[np.ndarray]] = {}
        for kf in self.keyframes:
            mono = cv2.imread(
                os.path.join(tree_prefix, "binary", f"{kf.idx}.png"), 0)
            if mono is None:  # tree without binaries yet: start blank
                mono = np.full(kf.raw_image.shape[:2], 255, np.uint8)
            self._binaries[kf.idx] = mono
            self._undo[kf.idx] = []

        portions_xml = os.path.join(tree_prefix, "portions.xml")
        if os.path.exists(portions_xml):
            for kf in self.keyframes:
                kf.binary_image = np.stack([self._binaries[kf.idx]] * 3,
                                           axis=-1)
            KeyframeAnnotation.load_portions(
                portions_xml, self.keyframes,
                os.path.join(tree_prefix, "portions"))

    # ------------------------------------------------------------ queries

    def keyframe_ids(self) -> List[int]:
        return [kf.idx for kf in self.keyframes]

    def _kf(self, kf_idx: int):
        for kf in self.keyframes:
            if kf.idx == kf_idx:
                return kf
        raise KeyError(f"unknown keyframe index {kf_idx}")

    def binary(self, kf_idx: int) -> np.ndarray:
        """uint8 [H, W] in the GT convention: ink=0 on 255 background."""
        return self._binaries[kf_idx]

    def raw(self, kf_idx: int) -> np.ndarray:
        return self._kf(kf_idx).raw_image

    def portions(self, kf_idx: int) -> List[dict]:
        return [{"index": k, "x": p.x, "y": p.y, "w": p.w, "h": p.h,
                 "dark": bool(p.dark)}
                for k, p in enumerate(self._kf(kf_idx).portions)]

    # -------------------------------------------------------------- edits

    def _push_undo(self, kf_idx: int) -> None:
        stack = self._undo[kf_idx]
        stack.append(self._binaries[kf_idx].copy())
        del stack[:-20]  # bound memory

    def stroke(self, kf_idx: int, points: Sequence[Tuple[int, int]],
               radius: int = 2, erase: bool = False) -> None:
        """Paint (ink, value 0) or erase (background, 255) along a
        polyline of canvas points — the pixel-paint loop of the reference
        GTPixelBinaryAnnotator."""
        import cv2

        self._push_undo(kf_idx)
        img = self._binaries[kf_idx]
        value = 255 if erase else 0
        pts = [(int(x), int(y)) for x, y in points]
        if len(pts) == 1:
            cv2.circle(img, pts[0], radius, value, -1)
        for a, b in zip(pts, pts[1:]):
            cv2.line(img, a, b, value, thickness=max(1, 2 * radius))

    def fill_rect(self, kf_idx: int, x: int, y: int, w: int, h: int,
                  erase: bool = True) -> None:
        self._push_undo(kf_idx)
        value = 255 if erase else 0
        self._binaries[kf_idx][y:y + h, x:x + w] = value

    def reject_portion(self, kf_idx: int, portion_index: int) -> None:
        """Reject a content portion: clear its pixels to background and
        drop it from the portion list (the accept/reject loop of the
        reference annotators; accepted portions are simply kept). Portion
        binaries are ink=0/bg=255 regardless of the Dark flag (Dark only
        records the board tone), so clearing is always erase=True."""
        kf = self._kf(kf_idx)
        portion = kf.portions[portion_index]
        self.fill_rect(kf_idx, portion.x, portion.y, portion.w, portion.h,
                       erase=True)
        del kf.portions[portion_index]

    def undo(self, kf_idx: int) -> bool:
        stack = self._undo[kf_idx]
        if not stack:
            return False
        self._binaries[kf_idx] = stack.pop()
        return True

    # --------------------------------------------------------------- save

    def save(self, rebuild_unique_ccs: bool = True) -> str:
        """Write the edited tree back: binary/<idx>.png, portions.xml +
        portions/ (rebuilt from the edited binaries), and unique_ccs.xml
        (CC identity chains recomputed) — exactly the export_gt_tree /
        reference-GUI file set, so cli.eval_summaries consumes it as-is."""
        from ..eval.aligner import build_unique_cc_groups
        from ..eval.annotation import (KeyframeAnnotation, UniqueCCGroup,
                                       portions_from_binary)

        for kf in self.keyframes:
            mono = self._binaries[kf.idx]
            kf.binary_image = np.stack([mono] * 3, axis=-1)
            kf.update_binary_cc(False)
            kf.portions = portions_from_binary(mono)
        KeyframeAnnotation.save_portions(self.keyframes, self.prefix)

        if rebuild_unique_ccs:
            groups, _ = build_unique_cc_groups(self.keyframes,
                                               local_window=3,
                                               min_recall=0.8,
                                               min_precision=0.8)
            with open(os.path.join(self.prefix, "unique_ccs.xml"), "w") as f:
                f.write(UniqueCCGroup.groups_to_xml(self.keyframes, groups))
        return self.prefix


# --------------------------------------------------------------- HTTP UI

PAGE = """<!DOCTYPE html>
<html><head><title>GT editor</title><style>
body { font-family: sans-serif; margin: 12px; }
#wrap { position: relative; display: inline-block; }
#raw, #bin { position: absolute; left: 0; top: 0; image-rendering: pixelated; }
#bin { opacity: 0.6; }
button.on { background: #cde; }
</style></head><body>
<div>
  <select id="kf"></select>
  <button id="paint" class="on">paint</button>
  <button id="erase">erase</button>
  brush <input id="radius" type="number" value="2" min="1" max="30" style="width:3em">
  <button id="undo">undo</button>
  <button id="save">save</button>
  <span id="status"></span>
</div>
<div id="wrap"><img id="raw"><img id="bin"></div>
<script>
let kf = null, erase = false, drawing = false, points = [];
const binImg = document.getElementById('bin');
const rawImg = document.getElementById('raw');
async function api(path, body) {
  const r = await fetch(path, body === undefined ? {} :
    {method: 'POST', body: JSON.stringify(body)});
  return r.json();
}
function refresh() {
  binImg.src = '/img/binary/' + kf + '?t=' + Date.now();
  rawImg.src = '/img/raw/' + kf + '?t=' + Date.now();
}
api('/api/state').then(s => {
  const sel = document.getElementById('kf');
  for (const idx of s.keyframes) {
    const o = document.createElement('option');
    o.value = idx; o.textContent = 'keyframe ' + idx;
    sel.appendChild(o);
  }
  kf = s.keyframes[0]; refresh();
  sel.onchange = () => { kf = parseInt(sel.value); refresh(); };
});
document.getElementById('paint').onclick = (e) => { erase = false;
  e.target.classList.add('on');
  document.getElementById('erase').classList.remove('on'); };
document.getElementById('erase').onclick = (e) => { erase = true;
  e.target.classList.add('on');
  document.getElementById('paint').classList.remove('on'); };
document.getElementById('undo').onclick = async () => {
  await api('/api/undo', {kf: kf}); refresh(); };
document.getElementById('save').onclick = async () => {
  document.getElementById('status').textContent = ' saving...';
  await api('/api/save', {});
  document.getElementById('status').textContent = ' saved'; };
function pos(e) {
  const r = binImg.getBoundingClientRect();
  return [Math.round(e.clientX - r.left), Math.round(e.clientY - r.top)];
}
binImg.ondragstart = () => false;
binImg.onmousedown = (e) => { drawing = true; points = [pos(e)]; };
binImg.onmousemove = (e) => { if (drawing) points.push(pos(e)); };
window.onmouseup = async () => {
  if (!drawing) return;
  drawing = false;
  await api('/api/stroke', {kf: kf, points: points, erase: erase,
    radius: parseInt(document.getElementById('radius').value)});
  refresh();
};
</script></body></html>
"""


def make_handler(session: GTEditorSession):
    import cv2
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, body: bytes, content_type: str = "application/json"):
            self.send_response(200)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, obj):
            self._send(json.dumps(obj).encode())

        def do_GET(self):
            if self.path == "/" or self.path.startswith("/index"):
                self._send(PAGE.encode(), "text/html")
            elif self.path.startswith("/api/state"):
                self._json({"keyframes": session.keyframe_ids(),
                            "prefix": session.prefix})
            elif self.path.startswith("/api/portions/"):
                kf_idx = int(self.path.rsplit("/", 1)[1].split("?")[0])
                self._json(session.portions(kf_idx))
            elif self.path.startswith(("/img/binary/", "/img/raw/")):
                kind, name = self.path.rsplit("/", 2)[-2:]
                kf_idx = int(name.split("?")[0].replace(".png", ""))
                if kind == "binary":
                    image = session.binary(kf_idx)
                else:
                    image = session.raw(kf_idx)[:, :, ::-1]
                ok, buffer = cv2.imencode(".png", image)
                assert ok
                self._send(buffer.tobytes(), "image/png")
            else:
                self.send_error(404)

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(length) or b"{}")
            if self.path.startswith("/api/stroke"):
                session.stroke(int(body["kf"]), body["points"],
                               radius=int(body.get("radius", 2)),
                               erase=bool(body.get("erase", False)))
                self._json({"ok": True})
            elif self.path.startswith("/api/rect"):
                session.fill_rect(int(body["kf"]), int(body["x"]),
                                  int(body["y"]), int(body["w"]),
                                  int(body["h"]),
                                  erase=bool(body.get("erase", True)))
                self._json({"ok": True})
            elif self.path.startswith("/api/reject_portion"):
                session.reject_portion(int(body["kf"]), int(body["index"]))
                self._json({"ok": True})
            elif self.path.startswith("/api/undo"):
                self._json({"ok": session.undo(int(body["kf"]))})
            elif self.path.startswith("/api/save"):
                self._json({"ok": True, "prefix": session.save()})
            else:
                self.send_error(404)

    return Handler


def serve(session: GTEditorSession, port: int = 0):
    """Start the editor UI server; returns the (bound) HTTPServer — call
    serve_forever() (blocking) or run it in a thread (tests)."""
    from http.server import ThreadingHTTPServer

    return ThreadingHTTPServer(("127.0.0.1", port), make_handler(session))
