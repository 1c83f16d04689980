"""sperr_tpu: a TPU-native SPERR-capability lossy compressor for scientific data.

Dense stages (CDF 9/7 wavelets, conditioning, midtread quantization, outlier
detection) run on TPU via JAX/Pallas, batched over volume chunks and sharded
across a device mesh; the SPECK bitplane entropy stage runs on the host
(native C++ engine with a NumPy reference engine).  Streams are
byte-compatible with NCAR/SPERR.
"""

__version__ = "0.1.0"

# Container format major version, matching the reference (SperrConfig: 0.8.5).
SPERR_VERSION_MAJOR = 0
