"""Optional runtime checks facade.

Parity: reference ``/root/reference/src/genjax/checkify.py`` — the
``do_checkify`` context manager gating `jax.experimental.checkify`
assertions (invalid ``Mask.unmask``, masked-assess guards, scan-edit
locality checks).
"""

from .checkify_ import do_checkify, optional_check

__all__ = ["do_checkify", "optional_check"]
