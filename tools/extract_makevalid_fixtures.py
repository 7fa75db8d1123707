"""Extract the reference's makevalid golden table into a JSON fixture.

Parses the Go literal data (NOT code) in
/root/reference/maths/makevalid/makevalid_test.go:
  * TestMakeValid's tbltest cases: input rings (as segment lists) and
    expected multipolygons (makevalid_test.go:219-337)
  * BenchmarkMakeValid5Poly{A,B,C} inputs (no goldens; invariants only)
and writes tests/fixtures/makevalid_golden.json.

The test file's clip extent is [-16, -16, 4112, 4112]
(makevalid_test.go:20-25).
"""

from __future__ import annotations

import json
import re
import sys

SRC = "/root/reference/maths/makevalid/makevalid_test.go"

PT = re.compile(r"maths\.Pt\{(?:X:\s*)?(-?[\d.]+),\s*(?:Y:\s*)?(-?[\d.]+)\}")
BARE_PT = re.compile(r"\{(-?[\d.]+),\s*(-?[\d.]+)\}")


def parse_segments_block(text: str):
    """One ring's segment list -> ordered point sequence."""
    pts = PT.findall(text)
    segs = [((float(pts[i][0]), float(pts[i][1])),
             (float(pts[i + 1][0]), float(pts[i + 1][1])))
            for i in range(0, len(pts), 2)]
    ring = [segs[0][0]]
    for a, b in segs:
        ring.append(b)
    if ring[0] == ring[-1]:
        ring = ring[:-1]
    return ring


def split_top_level(text: str):
    """Split a Go literal body into its top-level {...} chunks."""
    chunks, depth, start = [], 0, None
    for i, ch in enumerate(text):
        if ch == "{":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0 and start is not None:
                chunks.append(text[start + 1:i])
                start = None
    return chunks


def extract_between(src: str, start_pat: str, end_pat: str) -> str:
    s = src.index(start_pat)
    e = src.index(end_pat, s)
    return src[s:e]


def parse_expected_polygons(text: str):
    """polygons: [][][]maths.Pt -> list of polygons, each a list of
    rings, each a list of [x, y]."""
    polys = []
    for poly_chunk in split_top_level(text):
        rings = []
        # rings are []maths.Pt{...} groups
        for ring_chunk in re.findall(r"\[\]maths\.Pt\{([^}]*(?:\}[^}]*)*?)\}\s*,?\s*\n",
                                     poly_chunk + "\n"):
            pass
        # simpler: split on "[]maths.Pt{" and take until matching close
        parts = poly_chunk.split("[]maths.Pt{")
        for part in parts[1:]:
            depth = 1
            for i, ch in enumerate(part):
                if ch == "{":
                    depth += 1
                elif ch == "}":
                    depth -= 1
                    if depth == 0:
                        body = part[:i]
                        break
            ring = [[float(a), float(b)] for a, b in BARE_PT.findall(body)]
            rings.append(ring)
        if rings:
            polys.append(rings)
    return polys


def main():
    src = open(SRC).read()
    out = {"clip": [-16.0, -16.0, 4112.0, 4112.0], "cases": [], "bench_inputs": []}

    # ---- TestMakeValid table ----
    body = extract_between(src, "test := tbltest.Cases(", "\t)\n\t// test.RunOrder")
    case_texts = re.split(r"tcase\{", body)[1:]
    for ct in case_texts:
        lines_part = extract_between(ct, "lines:", "polygons:")
        rings = []
        # each ring is a top-level { ... } inside [][]maths.Line{ ... }
        inner = lines_part[lines_part.index("{") + 1:]
        # strip trailing "}," of the [][]maths.Line literal
        inner = inner[:inner.rindex("}")]
        for chunk in split_top_level(inner):
            ring = parse_segments_block(chunk)
            if ring:
                rings.append([[p[0], p[1]] for p in ring])
        poly_part = ct[ct.index("polygons:"):]
        poly_body = poly_part[poly_part.index("{") + 1:]
        # take until the closing of [][][]maths.Pt literal: last "}," at depth 0
        depth = 1
        for i, ch in enumerate(poly_body):
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    poly_body = poly_body[:i]
                    break
        expected = parse_expected_polygons(poly_body)
        out["cases"].append({"rings": rings, "expected": expected})

    # ---- benchmark inputs ----
    for name in ("BenchmarkMakeValid5PolyA", "BenchmarkMakeValid5PolyB",
                 "BenchmarkMakeValid5PolyC"):
        s = src.index(f"func {name}")
        e = src.index("hm := hitmap.NewFromLines", s)
        block = src[s:e]
        inner = block[block.index("[][]maths.Line{") + len("[][]maths.Line{"):]
        inner = inner[:inner.rindex("}")]
        rings = []
        for chunk in split_top_level(inner):
            ring = parse_segments_block(chunk)
            if ring:
                rings.append([[p[0], p[1]] for p in ring])
        out["bench_inputs"].append({"name": name, "rings": rings})

    path = "tests/fixtures/makevalid_golden.json"
    with open(path, "w") as f:
        json.dump(out, f)
    n_cases = len(out["cases"])
    print(f"wrote {path}: {n_cases} golden cases, "
          f"{len(out['bench_inputs'])} bench inputs")
    for i, c in enumerate(out["cases"]):
        print(f"  case {i}: {len(c['rings'])} rings "
              f"({[len(r) for r in c['rings']]} pts), "
              f"{len(c['expected'])} expected polys "
              f"({[[len(r) for r in p] for p in c['expected']]})")
    for b in out["bench_inputs"]:
        print(f"  {b['name']}: {len(b['rings'])} rings "
              f"({[len(r) for r in b['rings']]} pts)")
    return 0


def extract_hitmap():
    """Extract TestSegmentLinesContains (maths/hitmap/hitmap_test.go:13-135):
    ring vertex lists + golden containment grids."""
    src = open("/root/reference/maths/hitmap/hitmap_test.go").read()
    body = src[src.index("func TestSegmentLinesContains"):src.index("func TestNewFromPolygon")]
    cases = []
    for chunk in body.split("testcase{")[1:]:
        lines_part = chunk[chunk.index("lines: lines(") + len("lines: lines("):]
        depth = 1
        for i, ch in enumerate(lines_part):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    nums = [float(v) for v in re.findall(r"-?[\d.]+", lines_part[:i])]
                    break
        ring = [[nums[j], nums[j + 1]] for j in range(0, len(nums), 2)]
        pts = []
        pts_part = chunk[chunk.index("pts: []tstPt{"):]
        for m in re.finditer(r"\b(u?)cpt\((-?[\d.]+),\s*(-?[\d.]+)\)", pts_part):
            pts.append([float(m.group(2)), float(m.group(3)),
                        0 if m.group(1) == "u" else 1])
        cases.append({"ring": ring, "pts": pts})
    path = "tests/fixtures/hitmap_golden.json"
    with open(path, "w") as f:
        json.dump({"cases": cases}, f)
    print(f"wrote {path}: " + ", ".join(
        f"case {i}: ring {len(c['ring'])} pts, {len(c['pts'])} grid pts"
        for i, c in enumerate(cases)))


if __name__ == "__main__":
    if "--hitmap" in sys.argv:
        extract_hitmap()
        sys.exit(0)
    sys.exit(main())
