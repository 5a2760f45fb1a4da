"""fenicsxfus_tpu — TPU-native spectral-element focused-ultrasound framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
adeebkor/fenicsx-fus: high-order GLL spectral elements on quad/hex meshes,
matrix-free mass/stiffness operators as batched tensor contractions,
explicit RK and SDIRK time integration, linear / lossy / Westervelt
acoustics, windowed transducer sources, Sommerfeld ABCs, heterogeneous DG-0
media, and SPMD mesh sharding over TPU ICI.

Public API mirrors the reference package exports
(``python/src/fenicsxfus/__init__.py:14-31``).
"""

from .core.bowl import bowl_cap_area, create_bowl_box  # noqa: F401
from .core.mesh import (  # noqa: F401
    Mesh,
    as_unstructured,
    create_box,
    create_interval,
    create_rectangle,
    reorder_locality,
    tag_boundaries,
)
from .analysis.analytical import (  # noqa: F401
    PenetrableExact2D,
    SoundHardExact2D,
    SoundSoftExact2D,
)
from .models.experimental import (  # noqa: F401
    LinearSpectralAdaptive,
    LinearSpectralNewmark,
    LinearSpectralS2,
    LinearSpectralSciPy,
    LinearSpectralSponge,
    WesterveltSpectralAdaptive,
    WesterveltSpectralSciPy,
)
from .models.linear import (  # noqa: F401
    LinearExplicit,
    LinearSpectralExplicit,
    LinearSpectralImplicit,
)
from .models.focused import WesterveltSpectralFocused  # noqa: F401
from .models.lossy import LossySpectralExplicit, LossySpectralImplicit  # noqa: F401
from .models.westervelt import WesterveltSpectralExplicit  # noqa: F401
from .ops.operators import SEMOperators  # noqa: F401
from .utils import (  # noqa: F401
    compute_diffusivity_of_sound,
    estimate_stable_dt,
    compute_eval_params,
    eval_function,
)

__all__ = [
    "Mesh",
    "create_interval",
    "create_rectangle",
    "as_unstructured",
    "create_box",
    "create_bowl_box",
    "bowl_cap_area",
    "reorder_locality",
    "tag_boundaries",
    "SEMOperators",
    "LinearExplicit",
    "LinearSpectralExplicit",
    "LinearSpectralImplicit",
    "LossySpectralExplicit",
    "LossySpectralImplicit",
    "WesterveltSpectralExplicit",
    "WesterveltSpectralFocused",
    "LinearSpectralNewmark",
    "LinearSpectralS2",
    "LinearSpectralSponge",
    "LinearSpectralAdaptive",
    "LinearSpectralSciPy",
    "WesterveltSpectralAdaptive",
    "WesterveltSpectralSciPy",
    "SoundHardExact2D",
    "SoundSoftExact2D",
    "PenetrableExact2D",
    "compute_diffusivity_of_sound",
    "estimate_stable_dt",
    "compute_eval_params",
    "eval_function",
]

__version__ = "0.1.0"
