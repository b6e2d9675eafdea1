"""Offline preprocessing statistics: covariance, PCA, KPCA, ZCA, PCP, CKA."""

from vit_tpu.prepca.pipeline import (  # noqa: F401
    KernelPCAState,
    PreprocessingPipeline,
    ZCAWhitening,
    compute_cka,
    compute_kernel_pca,
    compute_pca,
    compute_pcp,
)
from vit_tpu.prepca.stats import (  # noqa: F401
    CovarianceStats,
    compute_covariance_stats,
    ensure_covariance,
    load_or_compute_covariance,
    zca_self_check,
)
