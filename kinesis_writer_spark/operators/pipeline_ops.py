"""Backwards-compatible facade: ``pipeline_ops`` grew to ~5k LoC and was
split (r8, zero behavior change) along its section comments into four
modules — importing THIS module still registers every query and re-exports
every public name, so existing imports keep working:

- :mod:`.pipeline_ops_corpus`   q205-q216 (corpus maintenance, robust stats)
- :mod:`.pipeline_ops_eval`     q217-q229 (eval, attribution, retrieval)
- :mod:`.pipeline_ops_audit`    q230-q243 (audits, maintenance planning)
- :mod:`.pipeline_ops_composed` q244-q250 (composed pipelines, cross-engine)
"""

from __future__ import annotations

from .pipeline_ops_audit import *  # noqa: F401,F403
from .pipeline_ops_composed import *  # noqa: F401,F403
from .pipeline_ops_corpus import *  # noqa: F401,F403
from .pipeline_ops_eval import *  # noqa: F401,F403

# Private names with external consumers (tests, streaming.incremental)
from .pipeline_ops_corpus import _INC_MOD  # noqa: F401
