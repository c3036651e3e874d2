"""s2d_tpu: TPU-native sparse-to-dense keymask distillation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of leonsick/s2d
(unsupervised video instance segmentation). See SURVEY.md at the repo root for
the structural map of the reference this framework re-implements TPU-first.
"""

__version__ = "0.1.0"
