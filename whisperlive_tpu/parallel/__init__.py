"""Device-mesh parallelism: shardings for serving (TP) and training (DP+TP)."""

from whisperlive_tpu.parallel.mesh import EngineShardings, make_mesh  # noqa: F401
from whisperlive_tpu.parallel import multihost  # noqa: F401
