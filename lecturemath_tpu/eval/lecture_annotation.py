"""Full-video ground-truth annotation: segment split points, per-segment
keyframe indices, and polygon video objects with keyframe-interpolated
location timelines.

XML round-trip compatible with the reference LectureAnnotation
(reference: AccessMath/annotation/lecture_annotation.py:11-379,
video_object.py:7-200, video_object_location.py:5-110, drawing_info.py).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass
class ObjectLocation:
    visible: bool
    frame: int
    abs_time: float
    polygon_points: np.ndarray  # float [N, 2]
    label: Optional[str] = None

    @staticmethod
    def interpolate(loc1: "ObjectLocation", loc2: "ObjectLocation",
                    frame: int) -> "ObjectLocation":
        """Linear interpolation between keyframe locations
        (reference: VideoObjectLocation.interpolate)."""
        if frame <= loc1.frame:
            return loc1
        if frame >= loc2.frame:
            return loc2
        w = (frame - loc1.frame) / float(loc2.frame - loc1.frame)
        return ObjectLocation(
            loc1.visible, frame,
            loc1.abs_time * (1.0 - w) + loc2.abs_time * w,
            loc1.polygon_points * (1.0 - w) + loc2.polygon_points * w,
            loc1.label)

    def to_xml(self, indent: str = "") -> str:
        lines = [f"{indent}<VideoObjectLocation>",
                 f"{indent}    <Visible>{1 if self.visible else 0}</Visible>",
                 f"{indent}    <Frame>{self.frame}</Frame>",
                 f"{indent}    <AbsTime>{self.abs_time}</AbsTime>"]
        if self.label is not None:
            lines.append(f"{indent}    <Label>{self.label}</Label>")
        lines.append(f"{indent}    <Polygon>")
        for x, y in self.polygon_points:
            lines.append(f"{indent}        <Point>")
            lines.append(f"{indent}            <X>{x}</X>")
            lines.append(f"{indent}            <Y>{y}</Y>")
            lines.append(f"{indent}        </Point>")
        lines.append(f"{indent}    </Polygon>")
        lines.append(f"{indent}</VideoObjectLocation>")
        return "\n".join(lines) + "\n"

    @staticmethod
    def from_xml(node: ET.Element) -> "ObjectLocation":
        points = [[float(p.findtext("X")), float(p.findtext("Y"))]
                  for p in node.find("Polygon").findall("Point")]
        return ObjectLocation(
            visible=node.findtext("Visible", "1").strip() == "1",
            frame=int(node.findtext("Frame")),
            abs_time=float(node.findtext("AbsTime", "0")),
            polygon_points=np.asarray(points, dtype=np.float64),
            label=node.findtext("Label"))


class TimelineObject:
    """A polygon object tracked over the video via sparse keyframe
    locations; queries interpolate between them
    (reference: VideoObject.get_location_at, video_object.py:101-130)."""

    SHAPE_ALIGNED_RECTANGLE = 0
    SHAPE_QUADRILATERAL = 1
    SHAPE_POLYGON = 2

    def __init__(self, object_id: str, name: str, shape_type: int):
        self.id = object_id
        self.name = name
        self.shape_type = shape_type
        self.locations: List[ObjectLocation] = []

    def first_frame(self) -> int:
        return self.locations[0].frame

    def last_frame(self) -> int:
        return self.locations[-1].frame

    def _find_index(self, frame: int) -> int:
        frames = [loc.frame for loc in self.locations]
        return int(np.searchsorted(frames, frame, side="left"))

    def set_location_at(self, frame: int, abs_time: float, visible: bool,
                        polygon_points) -> bool:
        idx = self._find_index(frame)
        points = np.asarray(polygon_points, dtype=np.float64)
        if idx < len(self.locations) and self.locations[idx].frame == frame:
            self.locations[idx].visible = visible
            self.locations[idx].polygon_points[:] = points
            return False
        label = self.locations[idx - 1].label if idx >= 1 else None
        self.locations.insert(idx, ObjectLocation(visible, frame, abs_time,
                                                  points, label))
        return True

    def del_location_at(self, frame: int) -> bool:
        idx = self._find_index(frame)
        if idx < len(self.locations) and self.locations[idx].frame == frame:
            del self.locations[idx]
            return True
        return False

    def get_location_at(self, frame: int, out_range: bool,
                        interpolate: bool = True) -> Optional[ObjectLocation]:
        if not self.locations:
            raise ValueError("object has no locations")
        idx = self._find_index(frame)
        if idx < len(self.locations) and self.locations[idx].frame == frame:
            return self.locations[idx]
        if idx == 0 or idx >= len(self.locations):
            if not out_range:
                return None
            return self.locations[0] if idx == 0 else self.locations[-1]
        if interpolate:
            return ObjectLocation.interpolate(self.locations[idx - 1],
                                              self.locations[idx], frame)
        return self.locations[idx - 1]

    def to_xml(self) -> str:
        lines = ["  <VideoObject>",
                 f"    <Id>{self.id}</Id>",
                 f"    <Name>{self.name}</Name>",
                 f"    <Shape>{self.shape_type}</Shape>",
                 "    <VideoObjectLocations>"]
        body = "".join(loc.to_xml("        ") for loc in self.locations)
        tail = ["    </VideoObjectLocations>", "  </VideoObject>"]
        return "\n".join(lines) + "\n" + body + "\n".join(tail) + "\n"

    @staticmethod
    def from_xml(node: ET.Element) -> "TimelineObject":
        obj = TimelineObject(node.findtext("Id"), node.findtext("Name"),
                             int(node.findtext("Shape")))
        locations_node = node.find("VideoObjectLocations")
        if locations_node is not None:
            for loc_node in locations_node.findall("VideoObjectLocation"):
                obj.locations.append(ObjectLocation.from_xml(loc_node))
        obj.locations.sort(key=lambda loc: loc.frame)
        return obj


@dataclass
class DrawingInfo:
    """Annotation-GUI viewport geometry kept for round-trip fidelity
    (reference: drawing_info.py)."""
    canvas_bbox: Tuple[float, float, float, float] = (0, 0, 0, 0)
    player_control_bbox: Tuple[float, float, float, float] = (0, 0, 0, 0)
    player_render_bbox: Tuple[float, float, float, float] = (0, 0, 1, 1)

    @staticmethod
    def from_xml(root: ET.Element) -> "DrawingInfo":
        node = root.find("DrawingInfo")
        if node is None:
            return DrawingInfo()

        def bbox(tag):
            sub = node.find(tag)
            if sub is None:
                return (0, 0, 1, 1)
            return tuple(float(sub.findtext(axis, "0"))
                         for axis in ("X", "Y", "W", "H"))

        return DrawingInfo(bbox("Canvas"), bbox("PlayerControl"),
                           bbox("PlayerRender"))

    def to_xml(self) -> str:
        def bbox(tag, box):
            x, y, w, h = box
            return (f"    <{tag}><X>{x}</X><Y>{y}</Y>"
                    f"<W>{w}</W><H>{h}</H></{tag}>\n")

        return ("  <DrawingInfo>\n" + bbox("Canvas", self.canvas_bbox) +
                bbox("PlayerControl", self.player_control_bbox) +
                bbox("PlayerRender", self.player_render_bbox) +
                "  </DrawingInfo>\n")


class LectureAnnotation:
    def __init__(self, db_name: str, title: str, output_file: str,
                 video_files: List[str], total_frames: int,
                 drawing_info: Optional[DrawingInfo] = None):
        self.db_name = db_name
        self.title = title
        self.output_file = output_file
        self.video_files = video_files
        self.total_frames = total_frames
        self.drawing_info = drawing_info or DrawingInfo()

        self.video_objects: Dict[str, TimelineObject] = {}
        self.video_segments: List[int] = []          # interior split points
        self.video_segment_keyframes: List[int] = []

    # -------------------------------------------------------------- XML

    def segments_with_bounds(self) -> List[int]:
        return [0] + self.video_segments + [self.total_frames]

    def to_xml(self) -> str:
        lines = ["<Annotations>"]
        lines.append(f"  <Database>{self.db_name}</Database>")
        lines.append(f"  <Lecture>{self.title}</Lecture>")
        lines.append(f"  <Filename>{self.output_file}</Filename>")
        lines.append("  <VideoFiles>")
        for path in self.video_files:
            lines.append(f"     <VideoFile>{path}</VideoFile>")
        lines.append("  </VideoFiles>")

        xml = "\n".join(lines) + "\n"
        xml += self.drawing_info.to_xml()

        xml += "  <VideoObjects>\n"
        for name in sorted(self.video_objects):
            xml += self.video_objects[name].to_xml()
        xml += "  </VideoObjects>\n"

        bounds = self.segments_with_bounds()
        xml += "  <VideoSegments>\n"
        for start, end in zip(bounds, bounds[1:]):
            xml += ("    <VideoSegment>\n"
                    f"        <Start>{start}</Start>\n"
                    f"        <End>{end}</End>\n"
                    "    </VideoSegment>\n")
        xml += "  </VideoSegments>\n"

        xml += "  <VideoKeyFrames>\n"
        for frame_idx in self.video_segment_keyframes:
            xml += ("    <VideoKeyFrame>\n"
                    f"       <Index>{frame_idx}</Index>\n"
                    "    </VideoKeyFrame>\n")
        xml += "  </VideoKeyFrames>\n"
        xml += "</Annotations>\n"
        return xml

    def save(self, path: Optional[str] = None) -> None:
        with open(path or self.output_file, "w") as f:
            f.write(self.to_xml())

    @staticmethod
    def load(filename: str, verbose: bool = False) -> "LectureAnnotation":
        root = ET.parse(filename).getroot()
        video_files = [n.text for n in
                       root.find("VideoFiles").findall("VideoFile")]

        starts, ends = [], []
        for node in root.find("VideoSegments").findall("VideoSegment"):
            starts.append(int(node.findtext("Start")))
            ends.append(int(node.findtext("End")))
        total_frames = max(ends) if ends else 0
        split_points = sorted(s for s in starts if s != 0)

        annotation = LectureAnnotation(
            root.findtext("Database"), root.findtext("Lecture"),
            root.findtext("Filename"), video_files, total_frames,
            DrawingInfo.from_xml(root))
        annotation.video_segments = split_points

        objects_node = root.find("VideoObjects")
        if objects_node is not None:
            for obj_node in objects_node.findall("VideoObject"):
                obj = TimelineObject.from_xml(obj_node)
                annotation.video_objects[obj.id] = obj
                if verbose:
                    print(f"loaded object {obj.name} "
                          f"({len(obj.locations)} keyframes)")

        keyframes_node = root.find("VideoKeyFrames")
        if keyframes_node is not None:
            annotation.video_segment_keyframes = sorted(
                int(n.findtext("Index"))
                for n in keyframes_node.findall("VideoKeyFrame"))

        return annotation
