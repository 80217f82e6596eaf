"""conette-info — environment/install report (reference parity:
``conette-info`` console script, ``src/conette/info.py``)."""

from __future__ import annotations

import platform
import sys


def print_install_info() -> int:
    import conette_tpu

    rows = {
        "conette_tpu": conette_tpu.__version__,
        "python": sys.version.split()[0],
        "os": platform.platform(),
    }
    for mod in ("jax", "jaxlib", "numpy", "optax", "flax", "h5py"):
        try:
            m = __import__(mod)
            rows[mod] = getattr(m, "__version__", "?")
        except Exception:
            rows[mod] = "not installed"
    try:
        import jax

        rows["jax.devices"] = ", ".join(str(d) for d in jax.devices())
        rows["default_backend"] = jax.default_backend()
    except Exception as err:  # keep info usable without an accelerator
        rows["jax.devices"] = f"unavailable ({err})"
    width = max(map(len, rows))
    for k, v in rows.items():
        print(f"{k:<{width}} : {v}")
    return 0


if __name__ == "__main__":
    sys.exit(print_install_info())
