"""conette-info — environment/install report (reference parity:
``conette-info`` console script, ``src/conette/info.py``)."""

from __future__ import annotations

import platform
import sys
from pathlib import Path


def get_package_repository_path() -> str:
    """Absolute path of the installed package's repository root
    (reference ``info.py:17-19``)."""
    return str(Path(__file__).parent.parent)


def get_install_info() -> dict[str, str]:
    """Versions + paths dict (reference ``info.py:22-34``, with the
    torch-stack rows replaced by the JAX stack)."""
    import conette_tpu
    from conette_tpu import get_sample_path

    rows: dict[str, str] = {
        "conette_tpu": conette_tpu.__version__,
        "python": sys.version.split()[0],
        "os": platform.platform(),
        "architecture": platform.architecture()[0],
    }
    for mod in ("jax", "jaxlib", "numpy", "optax", "flax", "h5py"):
        try:
            m = __import__(mod)
            rows[mod] = str(getattr(m, "__version__", "?"))
        except Exception:
            rows[mod] = "not installed"
    try:
        import jax

        rows["jax.devices"] = ", ".join(str(d) for d in jax.devices())
        rows["default_backend"] = jax.default_backend()
    except Exception as err:  # keep info usable without an accelerator
        rows["jax.devices"] = f"unavailable ({err})"
    rows["package_path"] = get_package_repository_path()
    rows["sample_path"] = get_sample_path()
    return rows


def print_install_info() -> int:
    rows = get_install_info()
    width = max(map(len, rows))
    for k, v in rows.items():
        print(f"{k:<{width}} : {v}")
    return 0


if __name__ == "__main__":
    sys.exit(print_install_info())
