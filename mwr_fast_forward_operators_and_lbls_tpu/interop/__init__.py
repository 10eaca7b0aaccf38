"""File-protocol interop with the reference pipeline's external RT models.

The reference drives its two fast forward operators through on-disk
protocols: RTTOV-gb through fixed-width text profiles + a printed report
(/root/reference/python_src/proc/RTTOV_gb_processing.py:80-305) and ARMS-gb
through a NetCDF input/output schema
(/root/reference/python_src/proc/ARMS_gb_processing.py:103-297).

These modules speak both protocols natively — read the files the reference
writes, and write the files its parsers read — so this framework can be
dropped into an existing reference deployment as the compute engine without
touching the surrounding scripts.
"""

from . import arms_gb, rttov_gb  # noqa: F401
