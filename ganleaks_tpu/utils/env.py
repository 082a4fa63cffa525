"""Boolean environment-flag convention, in ONE place.

Every ``GANLEAKS_*`` on/off switch parses identically: unset, empty and
``'0'`` mean OFF, anything else means ON — so ``VAR=0`` means what it
says. Modules must use this helper rather than re-implementing the rule
(divergent copies drift: a stray ``.strip()`` once made
``GANLEAKS_NO_AUTO_PLAN=' 0 '`` behave differently from every other
flag).
"""

from __future__ import annotations

import os


def env_flag(name: str) -> bool:
    """True iff the environment flag ``name`` is set (not '', not '0')."""
    return os.environ.get(name, "") not in ("", "0")
