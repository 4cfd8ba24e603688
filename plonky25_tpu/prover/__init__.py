from .prove import prove_on_device, TpuProver  # noqa: F401
