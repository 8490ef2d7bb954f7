"""mvd_tpu — TPU-native multi-view diffusion framework.

A ground-up JAX/XLA/Pallas rebuild of the MVD multi-view Stable Diffusion 2.1
research stack (reference: pananananas/MVD): frozen SD2.1 UNet + per-layer
image cross-attention adapters + FiLM camera conditioning, with the denoising
loop jit-compiled as a single ``lax.scan`` and the view axis sharded across a
TPU mesh.
"""

__version__ = "0.1.0"
