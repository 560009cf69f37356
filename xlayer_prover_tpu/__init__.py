"""xlayer_prover_tpu: TPU-native zkEVM proving framework.

Field elements are uint64 arrays; 64-bit integer support must be enabled
before any JAX computation, so importing this package flips jax_enable_x64.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)
