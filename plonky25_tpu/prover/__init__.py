from .prove import prove_on_device, TpuProver  # noqa: F401
from .batch_prove import BatchProver, prove_batch_on_device  # noqa: F401
