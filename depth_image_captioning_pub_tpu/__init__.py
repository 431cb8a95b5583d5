"""TPU-native depth-aware image-captioning framework.

A from-scratch JAX / XLA / Pallas / pjit re-design of the capabilities of
``Kyo-suke-S/Depth_image_captioning_pub`` (reference mounted read-only at
``/root/reference``): Show-and-Tell (NIC), Show-Attend-and-Tell with soft and
hard (Gumbel) attention, and the depth-augmented variants in which a frozen
DPT-hybrid monocular depth estimator feeds a trainable depth encoder whose
grid annotation vectors are fused (add / concat) with frozen-ResNet-152 RGB
annotation vectors before Bahdanau attention over 196 image regions.

Nothing here is a port: the reference's per-timestep Python loops become
``lax.scan``; its shrinking-batch packed sequences become fixed-shape masked
batches; its six copy-pasted decoder classes collapse into one decoder module
parameterized by (attention kind, depth fusion); its five copy-pasted train
loops become one functional, pjit-sharded train engine.

Subpackages
-----------
``config``    dataclass configs mirroring the reference's hyperparameter names
              (reference: Captioning_models/config.py).
``data``      tokenizer, vocabulary builder, COCO-captions reader (no
              pycocotools), fixed-shape batch pipeline, synthetic fixtures.
``ops``       functional compute primitives: attention scoring, LSTM cells,
              greedy/beam decode scans, Pallas TPU kernels.
``models``    flax.linen model zoo: ResNet-152, NIC encoder/decoder, the
              unified attention decoder, depth encoders, DPT-hybrid.
``parallel``  device mesh + sharding rules (batch-data-parallel over ICI).
``engine``    train / evaluate loops built on pjit-compiled steps.
``metrics``   self-contained BLEU / METEOR / ROUGE-L / CIDEr scorers
              (pycocoevalcap-compatible output scale).
``utils``     orbax checkpointing, torch-checkpoint bridge, CSV/JSONL logs.
``pipeline``  CaptionPipeline — one-call batched inference (paths/arrays in,
              caption strings out) over the jitted eval hot path.
``serve``     micro-batching HTTP caption server on top of the pipeline.
``native``    fastimage.cpp — threaded libjpeg batch decoder (C ABI/ctypes).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level convenience export: keep `import
    depth_image_captioning_pub_tpu` free of jax/flax import cost."""
    if name == "CaptionPipeline":
        from depth_image_captioning_pub_tpu.pipeline import CaptionPipeline
        return CaptionPipeline
    raise AttributeError(name)
