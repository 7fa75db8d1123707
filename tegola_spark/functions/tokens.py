"""Layer-SQL token substitution + typed query parameters (P2/P3, S2).

tegola layers are user-supplied SELECTs with mandated tokens, replaced
textually per (layer, tile): !BBOX! !ZOOM! !Z! !X! !Y!
!SCALE_DENOMINATOR! !PIXEL_WIDTH! !PIXEL_HEIGHT! plus user-declared
typed parameters (config/config.go:20-46; provider/postgis/util.go:129-210;
provider/query_parameter.go). The Spark form: the same token language
over a ``spark.sql`` statement, with the bbox rendered as a plain
range predicate (which Catalyst then pushes down).

Semantics ported exactly:
  * token regexp ![a-zA-Z0-9_-]+! , matched case-insensitively and
    replaced uppercased (provider/provider.go:124; util.go:233-237)
  * SCALE_DENOMINATOR = ZRes(z)/0.00028 ; PIXEL_WIDTH/HEIGHT = ZRes(z)
    (provider/postgis/util.go:181-190)
  * MapServer/Mapnik compatibility: !BOX! and !bbox! are accepted as
    aliases of !BBOX! (provider/postgis/postgis.go:781-787)
  * unknown tokens are an error (config validation,
    provider/postgis/postgis.go:816-827)
  * typed params: int/float/string/bool decoding with default values
    (provider/paramater_decoders.go:5-19)
"""

from __future__ import annotations

import re

from . import grid

TOKEN_RE = re.compile(r"!([a-zA-Z0-9_-]+)!")

RESERVED = {"BBOX", "BOX", "ZOOM", "Z", "X", "Y",
            "SCALE_DENOMINATOR", "PIXEL_WIDTH", "PIXEL_HEIGHT"}

PARAM_DECODERS = {
    "int": int,
    "float": float,
    "string": str,
    "bool": lambda s: s if isinstance(s, bool) else s.lower() in ("true", "1", "t", "yes"),
}


class UnknownTokenError(ValueError):
    pass


def decode_param(value, typ: str):
    """P3 typed decode — provider/paramater_decoders.go:5-19."""
    if typ not in PARAM_DECODERS:
        raise ValueError(f"unknown parameter type {typ!r}")
    return PARAM_DECODERS[typ](value)


class MissingParamError(ValueError):
    pass


class SQLFragment(str):
    """A resolved parameter SQL fragment — inserted verbatim by
    replace_tokens (plain strings are quoted as literals)."""


def _sql_literal(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


class QueryParameter:
    """P3 — provider/query_parameter.go:10-65.

    A declared parameter: ``token`` replaced by ``sql`` with every ``?``
    bound to the typed value. When the caller omits the param:
      * ``default_value`` (if set) is decoded with the param's type and
        used as the value (ToDefaultValue, query_parameter.go:44-53);
      * else ``default_sql`` (if set) replaces ``sql`` wholesale with no
        bound value (query_parameter.go:54-62);
      * else the parameter is required and resolution errors
        (query_parameter.go:63-64).
    Normalize (query_parameter.go:21-28): token uppercased, empty sql
    becomes bare "?".
    """

    def __init__(self, name: str, token: str, typ: str = "string",
                 sql: str = "", default_sql: str = "",
                 default_value: str = ""):
        self.name = name
        self.token = token.upper().strip("!")
        self.typ = typ
        self.sql = sql or "?"
        self.default_sql = default_sql
        self.default_value = default_value

    def resolve(self, raw_value=None) -> str:
        """Return the SQL fragment this param contributes. The reference
        binds the decoded value once as a positional arg and points every
        ``?`` at it (query_parameter_value.go:55-69); the Spark engine
        inlines the same literal at each ``?``."""
        if raw_value is not None:
            val = decode_param(raw_value, self.typ)
            return SQLFragment(self.sql.replace("?", _sql_literal(val)))
        if self.default_value:
            val = decode_param(self.default_value, self.typ)
            return SQLFragment(self.sql.replace("?", _sql_literal(val)))
        if self.default_sql:
            return SQLFragment(self.default_sql)
        raise MissingParamError(
            f"the required parameter {self.name} is not specified")


def resolve_params(declared, provided: dict | None = None) -> dict:
    """Build the token -> SQL-fragment map for replace_tokens from
    declared QueryParameters + user-supplied raw values (keyed by param
    name, as in the HTTP query string)."""
    provided = provided or {}
    out = {}
    for p in declared:
        out[p.token] = p.resolve(provided.get(p.name))
    return out


def bbox_predicate(minx, miny, maxx, maxy,
                   lon_col="lon", lat_col="lat") -> str:
    """The !BBOX! replacement: tegola emits `geom && ST_MakeEnvelope(...)`
    (util.go:152-179); the Spark engine emits the equivalent range
    predicate over lon/lat columns, which parquet min-max pruning and
    codegen handle natively."""
    return (f"({lon_col} >= {minx!r} AND {lon_col} <= {maxx!r} AND "
            f"{lat_col} >= {miny!r} AND {lat_col} <= {maxy!r})")


def replace_tokens(sql: str, z: int, x: int, y: int,
                   params: dict | None = None,
                   lon_col: str = "lon", lat_col: str = "lat",
                   buffer: float = grid.DEFAULT_BUFFER) -> str:
    """Substitute all tokens for one tile. ``params`` maps extra token
    names (upper-cased) to already-decoded values. Unknown tokens raise
    (mirroring config validation)."""
    ext = grid.buffered_tile_extent_3857(z, x, y, buffer=buffer)
    # bbox in lon/lat for the corpus predicate: invert the spherical merc
    minlon = float(grid.x2deg_spherical(ext[0]))
    maxlon = float(grid.x2deg_spherical(ext[2]))
    minlat = float(grid.y2deg_spherical(ext[1]))
    maxlat = float(grid.y2deg_spherical(ext[3]))
    zres = grid.zres(z)
    repl = {
        "BBOX": bbox_predicate(minlon, minlat, maxlon, maxlat, lon_col, lat_col),
        "BOX": bbox_predicate(minlon, minlat, maxlon, maxlat, lon_col, lat_col),
        "ZOOM": str(z), "Z": str(z), "X": str(x), "Y": str(y),
        "SCALE_DENOMINATOR": repr(zres / 0.00028),
        "PIXEL_WIDTH": repr(zres), "PIXEL_HEIGHT": repr(zres),
    }
    if params:
        for k, v in params.items():
            if isinstance(v, SQLFragment):
                repl[k.upper()] = str(v)
            else:
                repl[k.upper()] = repr(v) if isinstance(v, str) else str(v)

    def sub(m: re.Match) -> str:
        name = m.group(1).upper()
        if name not in repl:
            raise UnknownTokenError(f"unknown token !{m.group(1)}!")
        return repl[name]

    return TOKEN_RE.sub(sub, sql)


def validate_layer_sql(sql: str, declared_params=()) -> None:
    """Config-time validation — provider/postgis/postgis.go:788-827:
    must contain !BBOX! (or alias), and only reserved/declared tokens."""
    names = {m.group(1).upper() for m in TOKEN_RE.finditer(sql)}
    if not ({"BBOX", "BOX"} & names):
        raise ValueError("layer SQL must contain the !BBOX! token")
    allowed = RESERVED | {p.upper() for p in declared_params}
    unknown = names - allowed
    if unknown:
        raise UnknownTokenError(f"undeclared tokens: {sorted(unknown)}")
