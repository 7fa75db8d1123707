"""Job config handling (reference P12 + F5 layer catalog).

Env-var substitution semantics from internal/env/parse.go:11-44:
``${VAR}`` references are replaced from the environment anywhere in
config strings; a missing variable is an error (EnvVar required).
``${VAR:-default}`` extension: fall back to a default (tegola's env
package has typed defaults; the shell-style spelling is clearer here).

The config dict itself is plain data: maps -> layers -> provider sql /
zoom ranges / toggles, mirroring the TOML layout (config/config.go:51-70,
provider/map_layer.go:11-28).
"""

from __future__ import annotations

import os
import re

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)(?::-(.*?))?\}")


class MissingEnvVar(KeyError):
    pass


def substitute_env(value, env=None):
    """Recursively substitute ${VAR} / ${VAR:-default} in strings within
    any nested dict/list/str structure."""
    if env is None:
        env = os.environ

    def sub_str(s: str) -> str:
        def repl(m: re.Match) -> str:
            name, default = m.group(1), m.group(2)
            if name in env:
                return env[name]
            if default is not None:
                return default
            raise MissingEnvVar(f"config references unset env var ${{{name}}}")
        return _ENV_RE.sub(repl, s)

    if isinstance(value, str):
        return sub_str(value)
    if isinstance(value, dict):
        return {k: substitute_env(v, env) for k, v in value.items()}
    if isinstance(value, list):
        return [substitute_env(v, env) for v in value]
    return value


def validate_map_config(cfg: dict) -> None:
    """Config-time checks mirroring config/config.go:159-336: unique
    layer names per map; zoom ranges sane; overlapping zooms for the
    same layer name are an error (config.go:293-303)."""
    for map_name, m in cfg.get("maps", {}).items():
        seen: dict[str, list[tuple[int, int]]] = {}
        for layer in m.get("layers", []):
            name = layer["name"]
            lo = int(layer.get("min_zoom", 0))
            hi = int(layer.get("max_zoom", 22))
            if lo > hi or lo < 0 or hi > 22:
                raise ValueError(f"{map_name}/{name}: bad zoom range {lo}..{hi}")
            for (plo, phi) in seen.get(name, []):
                if lo <= phi and hi >= plo:
                    raise ValueError(
                        f"{map_name}/{name}: overlapping zoom ranges "
                        f"{lo}..{hi} vs {plo}..{phi}")
            seen.setdefault(name, []).append((lo, hi))
