"""Test harness config: hermetic CPU-JAX with a virtual 8-device mesh.

Tests never require a real TPU; sharding tests run on 8 virtual CPU devices
(mirrors the reference's CPU-only CI, SURVEY §4). Must run before jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The image's sitecustomize pre-imports jax with JAX_PLATFORMS=axon (the
# real-TPU tunnel), so the env var alone is too late — override via config
# before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def write_onnx_file(path, tensors):
    """Minimal ONNX writer: ModelProto{graph{initializer...}} with the
    fields read_onnx_initializers parses (dims/data_type/name/raw_data).
    Shared by the silero-VAD and wespeaker ingestion roundtrip tests."""

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    def field(num, wt, payload):
        if wt == 0:
            return varint((num << 3) | 0) + varint(payload)
        return varint((num << 3) | 2) + varint(len(payload)) + payload

    inits = b""
    for name, arr in tensors:
        t = b""
        for d in arr.shape:
            t += field(1, 0, d)
        t += field(2, 0, 1)  # float32
        t += field(8, 2, name.encode())
        t += field(9, 2, np.ascontiguousarray(arr, np.float32).tobytes())
        inits += field(5, 2, t)
    with open(path, "wb") as f:
        f.write(field(7, 2, inits))  # graph
