"""torch.hub entry point (twin of the reference ``hubconf.py:1-12``).

Usage: ``torch.hub.load("<this repo>", "conette", source=...)`` — returns
the JAX-backed ``CoNeTTEModel``; torch is only used as the hub transport.
"""

dependencies = ["numpy", "jax"]


def conette(pretrained_model_name_or_path: str = "Labbeti/conette", **kwargs):
    from conette_tpu import conette as _conette

    return _conette(pretrained_model_name_or_path, **kwargs)
