from .hll import HyperLogLog  # noqa: F401
from .tdigest import TDigest  # noqa: F401
from .histogram import CategoricalHistogram, NumericHistogram, kl_divergence, psi  # noqa: F401
