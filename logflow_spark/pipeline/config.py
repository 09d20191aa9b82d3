"""Config loader parity (reference MS5: config/config_reader.py:14-151 +
utils/env_loader.py:11-83 — .properties files with ${VAR} substitution,
environment override, and required-key validation). Engine-agnostic.
"""

from __future__ import annotations

import os
import re

_VAR = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def load_properties(
    path: str,
    env: dict[str, str] | None = None,
    env_override: bool = True,
) -> dict[str, str]:
    """Parse key=value lines; '#' comments; ${VAR} substituted from env.

    Unresolvable ${VAR} raises (the reference silently keeps the literal,
    which hides misconfiguration — we fail fast instead).
    """
    env = dict(os.environ if env is None else env)
    props: dict[str, str] = {}
    with open(path) as f:
        for lineno, raw in enumerate(f, 1):
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            if "=" not in line:
                raise ValueError(f"{path}:{lineno}: expected key=value, got {line!r}")
            k, v = line.split("=", 1)
            k, v = k.strip(), v.strip()

            def sub(m: re.Match) -> str:
                name = m.group(1)
                if name not in env:
                    raise KeyError(f"{path}:{lineno}: undefined variable ${{{name}}}")
                return env[name]

            props[k] = _VAR.sub(sub, v)
    if env_override:
        for k in list(props):
            env_key = k.upper().replace(".", "_")
            if env_key in env:
                props[k] = env[env_key]
    return props


def validate_required(props: dict[str, str], required: list[str]) -> None:
    missing = [k for k in required if not props.get(k)]
    if missing:
        raise ValueError(f"missing required config keys: {missing}")
