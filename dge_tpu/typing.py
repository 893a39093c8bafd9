"""Shape-annotated typing re-exports.

Reference analog: threestudio/utils/typing.py — jaxtyping Float[...] aliases
used across the codebase for documented tensor shapes. Usable with
``launch.py``-level runtime checking via jaxtyping+beartype/typeguard import
hooks (the reference's --typecheck flag, launch.py:72-75).
"""

from typing import (  # noqa: F401
    Any,
    Callable,
    Dict,
    Iterable,
    List,
    Literal,
    NamedTuple,
    Optional,
    Sequence,
    Tuple,
    Union,
)

try:  # jaxtyping is available in this image
    from jaxtyping import Bool, Float, Int, Num, Shaped  # noqa: F401
except ImportError:  # pragma: no cover
    Bool = Float = Int = Num = Shaped = None
