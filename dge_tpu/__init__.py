"""dge_tpu — TPU-native 3D Gaussian Splatting reconstruction & editing engine.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the DGE
reference (bonapark00/DGE): differentiable tile-binned 3DGS rasterization,
direct Gaussian fitting with densification, and multi-view-consistent
InstructPix2Pix editing with epipolar-constrained cross-view attention.

Component registry mirrors the reference's plain-dict registry
(/root/reference/threestudio/__init__.py:1-13) but is import-cycle-safe and
typed.
"""

__version__ = "0.1.0"

__modules__: dict = {}


def register(name: str):
    """Register a system/data/guidance class under a public name.

    Reference analog: threestudio.register (threestudio/__init__.py:4-9).
    """

    def decorator(cls):
        if name in __modules__ and __modules__[name] is not cls:
            raise ValueError(f"component '{name}' already registered")
        __modules__[name] = cls
        return cls

    return decorator


def find(name: str):
    """Look up a registered component by name.

    Reference analog: threestudio.find (threestudio/__init__.py:11-13).
    """
    if name not in __modules__:
        # Import side-effect registration packages lazily.
        from dge_tpu import systems as _systems  # noqa: F401
        from dge_tpu import diffusion as _diffusion  # noqa: F401
    if name not in __modules__:
        raise KeyError(
            f"component '{name}' not registered; known: {sorted(__modules__)}"
        )
    return __modules__[name]
