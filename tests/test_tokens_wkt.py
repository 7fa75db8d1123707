"""Token substitution (P2/P3), WKT codec (E10)."""

import numpy as np
import pytest

from tegola_spark.functions import tokens, wkt


def test_replace_tokens_basic():
    sql = "SELECT * FROM pages WHERE !BBOX! AND z = !ZOOM! -- !X!/!Y!"
    out = tokens.replace_tokens(sql, z=2, x=3, y=3)
    assert "!," not in out and "!BBOX!" not in out
    assert " z = 2 " in out
    assert "3/3" in out
    assert "lon >= " in out and "lat <= " in out


def test_replace_tokens_case_insensitive_and_aliases():
    # MapServer !BOX! / Mapnik !bbox! compat (postgis.go:781-787)
    out1 = tokens.replace_tokens("WHERE !bbox!", 1, 0, 0)
    out2 = tokens.replace_tokens("WHERE !BOX!", 1, 0, 0)
    assert out1 == out2


def test_scale_denominator():
    from tegola_spark.functions import grid
    out = tokens.replace_tokens("!SCALE_DENOMINATOR!|!PIXEL_WIDTH!", 4, 0, 0)
    sd, pw = out.split("|")
    assert float(pw) == pytest.approx(grid.zres(4))
    assert float(sd) == pytest.approx(grid.zres(4) / 0.00028)


def test_unknown_token_raises():
    with pytest.raises(tokens.UnknownTokenError):
        tokens.replace_tokens("SELECT !NOPE!", 1, 0, 0)


def test_user_params():
    out = tokens.replace_tokens("WHERE !BBOX! AND cat = !CATEGORY!",
                                1, 0, 0, params={"category": "road"})
    assert "cat = 'road'" in out
    assert tokens.decode_param("5", "int") == 5
    assert tokens.decode_param("true", "bool") is True
    assert tokens.decode_param("2.5", "float") == 2.5


def test_validate_layer_sql():
    tokens.validate_layer_sql("SELECT 1 WHERE !BBOX!")
    with pytest.raises(ValueError):
        tokens.validate_layer_sql("SELECT 1")  # missing BBOX
    with pytest.raises(tokens.UnknownTokenError):
        tokens.validate_layer_sql("SELECT 1 WHERE !BBOX! AND !FOO!")
    tokens.validate_layer_sql("SELECT 1 WHERE !BBOX! AND !FOO!",
                              declared_params=["foo"])


def test_bbox_tokens_tile_z1():
    # z=1 x=0 y=0 buffered extent covers the NW quadrant and a margin
    out = tokens.replace_tokens("!BBOX!", 1, 0, 0)
    # extract numbers
    import re
    nums = [float(v) for v in re.findall(r"-?\d+\.?\d*(?:e-?\d+)?", out)]
    minx, maxx, miny, maxy = nums[0], nums[1], nums[2], nums[3]
    # buffer = 64px * pixel_ratio(z=1) = ~2.8 degrees
    assert minx < -179.9 and 0.0 < maxx < 3.0
    assert -3.0 < miny < 0.0 and maxy > 85


GEOMS = [
    ("Point", np.array([1.5, -2.5])),
    ("MultiPoint", np.array([[0.0, 0.0], [3.0, 4.0]])),
    ("LineString", np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 0.5]])),
    ("MultiLineString", [np.array([[0.0, 0.0], [1.0, 1.0]]),
                         np.array([[5.0, 5.0], [6.0, 7.0]])]),
    ("Polygon", [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 0.0]]),
                 np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 1.0]])]),
    ("MultiPolygon", [[np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 0.0]])],
                      [np.array([[10.0, 10.0], [14.0, 10.0], [14.0, 14.0], [10.0, 10.0]])]]),
]


@pytest.mark.parametrize("geom", GEOMS, ids=[g[0] for g in GEOMS])
def test_wkt_roundtrip(geom):
    out = wkt.decode(wkt.encode(geom))
    assert out[0] == geom[0]
    assert wkt.encode(out) == wkt.encode(geom)


def test_wkt_known_strings():
    assert wkt.encode(("Point", np.array([1.0, 2.0]))) == "POINT (1 2)"
    t, d = wkt.decode("POLYGON ((0 0,4 0,4 4,0 0),(1 1,2 1,2 2,1 1))")
    assert t == "Polygon" and len(d) == 2


# -- P3 typed query parameters with defaults (query_parameter.go:21-65) ------

def test_query_param_provided_value():
    from tegola_spark.functions import tokens
    p = tokens.QueryParameter("min_pop", "!MIN_POP!", "int", sql="pop >= ?")
    assert str(p.resolve("1000")) == "pop >= 1000"


def test_query_param_default_value_decoded_with_type():
    from tegola_spark.functions import tokens
    p = tokens.QueryParameter("min_pop", "!MIN_POP!", "int",
                              sql="pop >= ?", default_value="50")
    assert str(p.resolve(None)) == "pop >= 50"


def test_query_param_default_sql_replaces_wholesale():
    from tegola_spark.functions import tokens
    p = tokens.QueryParameter("flt", "!FLT!", "string",
                              sql="name = ?", default_sql="TRUE")
    assert str(p.resolve(None)) == "TRUE"
    # a provided value still uses the main sql
    assert str(p.resolve("x'y")) == "name = 'x''y'"


def test_query_param_required_missing_raises():
    from tegola_spark.functions import tokens
    import pytest as _pytest
    p = tokens.QueryParameter("req", "!REQ!", "int", sql="a = ?")
    with _pytest.raises(tokens.MissingParamError):
        p.resolve(None)


def test_query_param_empty_sql_normalizes_to_placeholder():
    # Normalize (query_parameter.go:25-27): empty sql -> bare "?"
    from tegola_spark.functions import tokens
    p = tokens.QueryParameter("v", "v", "float")
    assert str(p.resolve("2.5")) == "2.5"
    assert p.token == "V"


def test_resolve_params_into_replace_tokens():
    from tegola_spark.functions import tokens
    declared = [
        tokens.QueryParameter("min_pop", "!MIN_POP!", "int",
                              sql="pop >= ?", default_value="10"),
        tokens.QueryParameter("cls", "!CLS!", "string",
                              sql="class = ?", default_sql="TRUE"),
    ]
    frags = tokens.resolve_params(declared, {"min_pop": "99"})
    sql = tokens.replace_tokens(
        "SELECT * FROM t WHERE !BBOX! AND !MIN_POP! AND !CLS!",
        z=1, x=0, y=0, params=frags)
    assert "pop >= 99" in sql and "TRUE" in sql and "!" not in sql.split("WHERE")[1]
