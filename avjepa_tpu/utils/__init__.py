"""Shared utilities (reference: src/utils/)."""

import os


def env_flag(name: str, default: bool = False) -> bool:
    """Tolerant boolean env parse: accepts 1/0, true/false, yes/no, on/off.

    Preemption supervisors set flags like ``AVJEPA_RESUME_PREEMPT=true``;
    crashing on a non-integer spelling at relaunch time would defeat the
    variable's purpose (resuming after SIGTERM), so unknown values fall back
    to ``default`` with no exception.
    """
    raw = os.environ.get(name)
    if raw is None:
        return default
    val = raw.strip().lower()
    if val in ("1", "true", "yes", "on", "y"):
        return True
    if val in ("0", "false", "no", "off", "n", ""):
        return False
    # Loud fallback: e.g. a mis-typed AVJEPA_MULTIHOST=ture silently skipping
    # jax.distributed.initialize() would run a pod as N independent
    # single-host jobs all writing the same folder.
    import logging

    logging.getLogger(__name__).warning(
        "%s=%r not understood; using %s", name, raw, default
    )
    return default
