"""PARC-TPU: a TPU-native physics-based character animation framework.

A from-scratch JAX/XLA/Pallas rebuild of the PARC data-augmentation loop
(motion diffusion -> kinematic generation -> physics tracking -> recording),
designed SPMD-first for TPU device meshes.
"""

__version__ = "0.1.0"
