"""WKT geometry codec (reference E10) — debug/golden-fixture format
(vendor/.../geom/encoding/wkt). Minimal 2D implementation over the
same geometry-tuple model as wkb.py."""

from __future__ import annotations

import re

import numpy as np


def _fmt(v: float) -> str:
    if v == int(v):
        return str(int(v))
    return repr(float(v))


def _coords(arr) -> str:
    arr = np.asarray(arr, dtype=np.float64).reshape(-1, 2)
    return ",".join(f"{_fmt(p[0])} {_fmt(p[1])}" for p in arr)


def encode(geom) -> str:
    gtype, data = geom
    if gtype == "Point":
        return f"POINT ({_coords(np.asarray(data).reshape(1, 2))})"
    if gtype == "MultiPoint":
        return f"MULTIPOINT ({_coords(data)})"
    if gtype == "LineString":
        return f"LINESTRING ({_coords(data)})"
    if gtype == "MultiLineString":
        inner = ",".join(f"({_coords(l)})" for l in data)
        return f"MULTILINESTRING ({inner})"
    if gtype == "Polygon":
        inner = ",".join(f"({_coords(r)})" for r in data)
        return f"POLYGON ({inner})"
    if gtype == "MultiPolygon":
        inner = ",".join(
            "(" + ",".join(f"({_coords(r)})" for r in rings) + ")" for rings in data)
        return f"MULTIPOLYGON ({inner})"
    raise ValueError(f"unsupported geometry type {gtype!r}")


def _parse_coords(s: str) -> np.ndarray:
    pts = []
    for pair in s.split(","):
        xy = pair.split()
        pts.append((float(xy[0]), float(xy[1])))
    return np.array(pts, dtype=np.float64)


def _split_groups(s: str) -> list[str]:
    """Split 'a),(b' style nesting at depth 0 commas."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == ")":
            depth -= 1
            if depth == 0:
                out.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return out


def decode(wkt: str):
    wkt = wkt.strip()
    m = re.match(r"([A-Z]+)\s*\((.*)\)\s*$", wkt, re.S)
    if not m:
        raise ValueError(f"bad WKT: {wkt[:40]!r}")
    typ, body = m.group(1), m.group(2)
    if typ == "POINT":
        return ("Point", _parse_coords(body).reshape(2))
    if typ == "MULTIPOINT":
        body2 = body.replace("(", "").replace(")", "")
        return ("MultiPoint", _parse_coords(body2))
    if typ == "LINESTRING":
        return ("LineString", _parse_coords(body))
    if typ == "MULTILINESTRING":
        return ("MultiLineString", [_parse_coords(g) for g in _split_groups(f"({body})"[1:-1])])
    if typ == "POLYGON":
        return ("Polygon", [_parse_coords(g) for g in _split_groups(body)])
    if typ == "MULTIPOLYGON":
        polys = []
        for grp in _split_groups(body):
            polys.append([_parse_coords(g) for g in _split_groups(grp)])
        return ("MultiPolygon", polys)
    raise ValueError(f"unsupported WKT type {typ}")
