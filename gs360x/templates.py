"""Generated data templates.

The reference ships a 1,087-line Metashape calibration XML for the DJI
Osmo 360 (``cli_tools/templates/Osmo360-Fisheye-Distortion.xml``). Rather
than copying that file, this module *generates* an equivalent starter
calibration from the camera's physical constants (two equisolid-fisheye
sensors, 3840² px, nominal f≈1050 px): enough for the dual-fisheye pipeline
to run before a user substitutes their own Metashape-adjusted calibration.
"""

from __future__ import annotations

import pathlib
import xml.etree.ElementTree as ET

# DJI Osmo 360 nominal sensor constants
OSMO360_SENSOR_PX = 3840
OSMO360_NOMINAL_F_PX = 1050.0


def write_osmo360_default_calibration(path) -> pathlib.Path:
    """Write a two-sensor equisolid-fisheye calibration XML for the Osmo
    360 (initial class, zero distortion coefficients — a starter prior,
    not an adjusted calibration)."""
    doc = ET.Element("document", {"version": "1.2.0"})
    chunk = ET.SubElement(doc, "chunk", {"label": "osmo360-default",
                                         "enabled": "true"})
    sensors = ET.SubElement(chunk, "sensors", {"next_id": "2"})
    for sid, label in (("0", "Osmo360 lens X"), ("1", "Osmo360 lens Y")):
        sensor = ET.SubElement(sensors, "sensor",
                               {"id": sid, "label": label,
                                "type": "fisheye"})
        ET.SubElement(sensor, "resolution",
                      {"width": str(OSMO360_SENSOR_PX),
                       "height": str(OSMO360_SENSOR_PX)})
        calib = ET.SubElement(sensor, "calibration",
                              {"type": "fisheye", "class": "initial"})
        ET.SubElement(calib, "resolution",
                      {"width": str(OSMO360_SENSOR_PX),
                       "height": str(OSMO360_SENSOR_PX)})
        ET.SubElement(calib, "f").text = f"{OSMO360_NOMINAL_F_PX:g}"
    cameras = ET.SubElement(chunk, "cameras", {"next_id": "0"})
    del cameras

    out = pathlib.Path(path)
    out.parent.mkdir(parents=True, exist_ok=True)
    tree = ET.ElementTree(doc)
    ET.indent(tree, space="  ")
    tree.write(out, encoding="utf-8", xml_declaration=True)
    return out


def default_osmo360_calibration_path() -> pathlib.Path:
    """Cached default calibration under the user config dir (generated on
    first use)."""
    path = pathlib.Path.home() / ".gs360x" / "osmo360_default_calib.xml"
    if not path.exists():
        write_osmo360_default_calibration(path)
    return path
