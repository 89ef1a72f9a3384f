"""ECMA-262 whitespace, for byte-parity with the reference's JS regexes.

JS ``\\s`` (WhiteSpace + LineTerminator) differs from Python's ``\\s``
in BOTH directions:

* JS includes U+FEFF (BOM); Python does not;
* Python includes U+001C-001F (file/group/record/unit separators) and
  U+0085 (NEL); JS does not.

Every ``(^|\\s)`` / ``(?=$|\\s)`` boundary in the reference parsers
(amount_parser.js, date_parser.js) therefore needs this explicit class
instead of Python ``\\s`` — found by the node differential oracles
(tools/diff_date_repair_oracle.py, tools/diff_amount_oracle.py), which
both showed real divergences on BOM/NEL-adjacent text before the fix
and 0 mismatches after.

Use inside a character class: ``rf"(^|[{JS_WS}])"``.
"""

JS_WS = (
    "\t\n\x0b\x0c\r \xa0 "
    " - "  # contiguous range — valid inside a [...] class
    "    　﻿"
)
