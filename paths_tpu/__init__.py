"""paths_tpu — a TPU-native (JAX/XLA/Pallas) framework for hierarchical
whole-slide-image analysis with the capabilities of PATHS
("Pathology Transformer with Hierarchical Selection", arXiv:2411.18225).

The framework processes gigapixel WSIs top-down across magnification levels:
at each level a transformer scores patch importance, the top-K patches are
kept, and their 2x-zoom quadrant children form the next level's input.

Design stance (TPU-first, not a port):
  * every level step is a statically-shaped, masked, jitted program —
    padded patch bags with boolean masks replace dynamic-length collation
  * top-K selection and x4 child expansion are on-device tensor ops
    (`lax.top_k` + gathers), batched over slides, with no host sync
  * training runs data-parallel over a `jax.sharding.Mesh`; communication
    is XLA collectives, never a hand-written backend
  * the recursion is differentiated end-to-end with `jax.grad`, exactly
    mirroring how autograd threads context through levels in the reference

Reference behavior spec: see SURVEY.md (citations like `model/paths.py:66`
point into the reference implementation this framework is parity-checked
against).
"""

__version__ = "0.1.0"

from paths_tpu.config import Config, PATHSProcessorConfig  # noqa: F401
