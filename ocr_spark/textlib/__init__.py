"""Pure-Python parser core — exact ports of the reference semantics.

No Spark imports here: these functions are the single source of truth
used by (a) the Arrow-vectorized UDF layer, (b) the pytest goldens, and
(c) as oracles for the Catalyst expression forms.
"""

from . import aadhaar, bank, dl, employee, goutil, itr, names, pan, quality, salary

__all__ = ["aadhaar", "bank", "dl", "employee", "goutil", "itr",
           "names", "pan", "quality", "salary"]
