"""Multi-chip / multi-host scaling: meshes, sharded batches, halo exchange.

The reference is a single-process crate; its only parallelism is rayon loops
and plan-reuse batch loops (SURVEY §2.6). The TPU-native replacements:

- ``vmap`` turns a plan into a batch program (done in the plans themselves)
- :mod:`~spectrograms_tpu.parallel.mesh` — device meshes + named shardings
- :mod:`~spectrograms_tpu.parallel.data` — utterance-batch data parallelism
  over a ``('data',)`` mesh axis: batch sharded per chip, filterbank/DCT
  weights replicated, **zero collectives in the hot path** (feature lanes are
  independent); ``psum`` only in metric reduction
- :mod:`~spectrograms_tpu.parallel.sequence` — long-signal sequence
  parallelism: shard the time axis, exchange an (n_fft − hop)-sample halo via
  ``ppermute`` (the only communication this workload needs)
- :mod:`~spectrograms_tpu.parallel.batching` — ragged-batch utilities
  (stacking/padding parity with the reference's ``jax.py`` ``batch()``)
- ``initialize_distributed`` — multi-host bring-up via ``jax.distributed``
"""

from .mesh import create_device_mesh, make_named_sharding, initialize_distributed
from .data import shard_batch, data_parallel_pipeline, audio_seconds_per_second
from .sequence import sequence_parallel_spectrogram
from .batching import batch, batch_with_metadata, pad_signals

__all__ = [
    "create_device_mesh",
    "make_named_sharding",
    "initialize_distributed",
    "shard_batch",
    "data_parallel_pipeline",
    "audio_seconds_per_second",
    "sequence_parallel_spectrogram",
    "batch",
    "batch_with_metadata",
    "pad_signals",
]
