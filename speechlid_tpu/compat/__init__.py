"""Interop with the reference torch stack (/root/reference).

``refstubs.install()`` registers minimal stand-ins for packages the
reference imports but this image lacks (torchaudio, torchmetrics,
WavAugment's ``augment``), so the reference's actual training loop and
modules can run on CPU for fidelity A/B experiments and parity tests.
"""

from speechlid_tpu.compat.refstubs import install  # noqa: F401
