"""audiodepth_tpu — TPU-native (JAX/XLA/Pallas/pjit) audio→depth framework.

A from-scratch rebuild of the capabilities of the BatVision
audio-depth-estimation stack (reference: Kang-ChangWoo/audio-depth-estimation):
binaural chirp-echo recordings → 256×256 metric depth maps, with five model
families, shared eval metrics, a single training engine, and data-parallel
sharding over a TPU mesh.

Design principles (TPU-first, not a port):
  * NHWC layouts, bfloat16 compute / fp32 params, static shapes everywhere.
  * The waveform→spectrogram front end (time-of-flight cut, STFT/Mel, log,
    per-channel min-max, resize) is a fused on-device op built on MXU matmuls
    (frames × DFT basis) rather than a host-side torchaudio pipeline.
  * One jitted train/eval step engine shared by every model family; curriculum
    phases are traced scalar switches (stop_gradient gating), never retraces.
  * Parallelism via jax.sharding.Mesh + NamedSharding; collectives are
    inserted by XLA, not hand-written.
"""

__version__ = "0.1.0"
