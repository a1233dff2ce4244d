"""rcppml_tpu — TPU-native matrix-factorization framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
RcppML/FactorNet reference: ALS-NMF with six IRLS distributions,
zero-inflation, rich regularization, speckled-holdout CV with automatic rank
search, five truncated-SVD algorithms, rank-2 divisive clustering, a
composable multi-layer factor-graph engine, and sharded multi-chip
execution over a ``jax.sharding.Mesh``.
"""

from .api import nmf, build_config
from .config import (Dispersion, FactorConfig, Loss, NMFConfig, Norm, Solver,
                     SVDConfig, ZI)
from .result import NMFResult, SVDResult

__version__ = "0.1.0"

__all__ = [
    "nmf", "build_config",
    "NMFConfig", "FactorConfig", "SVDConfig",
    "Loss", "Dispersion", "ZI", "Norm", "Solver",
    "NMFResult", "SVDResult",
]


def __getattr__(name):
    # Lazy heavy submodule accessors so `import rcppml_tpu` stays light.
    if name in ("svd", "pca"):
        from .models import svd as _svd
        return getattr(_svd, name)
    if name in ("bipartition", "dclust"):
        from .models import clustering as _cl
        return getattr(_cl, name)
    if name in ("nnls", "predict", "evaluate", "mse"):
        from .models import project as _proj
        return getattr(_proj, name)
    if name == "consensus_nmf":
        from .models.clustering import consensus_nmf as _cn
        return _cn
    if name == "default_mesh":
        from .parallel.mesh import default_mesh as _dm
        return _dm
    if name == "simulate_nmf":
        from .utils.simulate import simulate_nmf as _sim
        return _sim
    if name in ("set_verbosity", "get_verbosity", "LogLevel"):
        from .utils import logging as _log
        return getattr(_log, name)
    raise AttributeError(f"module 'rcppml_tpu' has no attribute {name!r}")
