"""Small host-side utilities.

Parity target: /root/reference/utils.py:58-80 (bbox format converters and
string cleaning; numpy-only — no torch dependency).
"""

from __future__ import annotations

import re

import numpy as np


def xyxy2xywh(x: np.ndarray) -> np.ndarray:
    """[x1,y1,x2,y2] -> [cx,cy,w,h] (utils.py:58-65)."""
    y = np.copy(x)
    y[:, 0] = (x[:, 0] + x[:, 2]) / 2
    y[:, 1] = (x[:, 1] + x[:, 3]) / 2
    y[:, 2] = x[:, 2] - x[:, 0]
    y[:, 3] = x[:, 3] - x[:, 1]
    return y


def xywh2xyxy(x: np.ndarray) -> np.ndarray:
    """[cx,cy,w,h] -> [x1,y1,x2,y2] (utils.py:68-75)."""
    y = np.copy(x)
    y[:, 0] = x[:, 0] - x[:, 2] / 2
    y[:, 1] = x[:, 1] - x[:, 3] / 2
    y[:, 2] = x[:, 0] + x[:, 2] / 2
    y[:, 3] = x[:, 1] + x[:, 3] / 2
    return y


def clean_str(s: str) -> str:
    """Replace special characters with underscores (utils.py:78-80)."""
    return re.sub(pattern="[|@#!¡·$€%&()=?¿^*;:,¨´><+]", repl="_", string=s)


def enable_compilation_cache(path: str = None) -> str:
    """Enable JAX's persistent compilation cache (verified to work
    through the axon remote-compile tunnel: a 62 s first-process compile
    replays in 0.25 s from a second process). Called by every CLI and by
    bench.py; respects JAX_COMPILATION_CACHE_DIR when already set."""
    import os

    import jax

    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.expanduser("~/.cache/vqax_jax_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache EVERYTHING (threshold 0): the remote compile service's
    # latency is bimodal (the same trivial program measured 0.8 s and
    # 150 s in adjacent runs). With the default 1 s threshold, a
    # fast-path compile is never written, so the NEXT process can pay
    # a slow-path recompile — the worst of both worlds.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
