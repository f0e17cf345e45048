"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
tests validate multi-chip layouts without TPU hardware (the driver separately
dry-runs the multichip path)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
