"""Test configuration: run JAX on a virtual 8-device CPU mesh so parallelism
logic is testable without a TPU slice (SURVEY.md §4 implication).

The image preloads jax via a sitecustomize that registers the 'axon' TPU
tunnel backend whenever PALLAS_AXON_POOL_IPS is set, and exports
JAX_PLATFORMS=axon. Initializing that backend from tests is both wrong
(tests must not grab the single TPU chip out from under a bench run) and
flaky (the tunnel round-trip can block indefinitely), so we force the CPU
platform AND deregister the axon factory before any backend initialization
(which is lazy, so this conftest runs early enough).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("HALLO_TPU_ATTENTION", "xla")

import jax  # noqa: E402
import jax._src.xla_bridge as _xb  # noqa: E402

# Persistent compilation cache: XLA compiles take minutes on this 1-core
# host; cache across processes/sessions. CPU entries embed host CPU target
# features, so they live in a host-keyed dir (a foreign host rejecting them
# with "machine type mismatch" poisoned the r4 driver artifact).
from hallo_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache(cpu=True)

# jax is preloaded, so its config already captured JAX_PLATFORMS=axon from
# the ambient env; override through the live config as well.
jax.config.update("jax_platforms", "cpu")

# Drop only the axon tunnel backend; "tpu" must stay registered as a known
# platform or pallas-TPU imports fail (mlir lowering registration).
_xb._backend_factories.pop("axon", None)

# Random-init tiny params cached to disk (utils/factory.py): the six
# jit-inits per build_models() dominated the r2 suite wall clock.
os.environ.setdefault("HALLO_PARAM_CACHE", "/root/repo/.test_cache")
