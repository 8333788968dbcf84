"""Presto-dialect SQL → Spark SQL translation (the "light shim" of
SURVEY.md §7).

Spark SQL accepts most of the reference grammar
(presto-parser/.../SqlBase.g4) verbatim: SELECT/joins/grouping sets/
windows/UNNEST-equivalents/set ops/CTEs/VALUES/TABLESAMPLE all parse.
What breaks is a short list of function-name collisions with different
semantics (SURVEY §7 risk #2) — exactly the names this module owns.
Everything else passes through untouched, so Catalyst sees a plain
Spark query and every optimization applies.

NOT a SQL parser: rewrites are token-aware regexes on names + literal
patterns, which covers the reference's documented signatures.  For
programmatic use the DataFrame registry (prestodb_presto_spark.functions)
is the first-class surface.
"""

from __future__ import annotations

import math
import re

from prestodb_presto_spark.functions.datetime_fns import _mysql_to_java

# Presto name -> Spark name, signature-compatible 1:1 renames.
# (approx_distinct routes through _approx_distinct_rewrite below — the
# default-error form hits the bit-exact airlift-parity UDAF)
_RENAMES = {
    "json_extract_scalar": "get_json_object",
    "json_extract": "get_json_object",
    "strpos": "instr",
    "json_array_length": "json_array_length",  # same name (Spark 3.1+)
    "to_unixtime": "unix_timestamp",
    "from_unixtime": "timestamp_seconds",
    "json_parse": "",  # identity: Spark JSON fns take the string directly
    "json_format": "",
    "levenshtein_distance": "levenshtein",
    # Presto element_at returns NULL out of bounds / on a missing key
    # (ArrayFunctions/MapSubscript); Spark-ANSI element_at raises.
    # This also catches the dialect's own emitted element_at (subscripts
    # included) — a documented softening of Presto's erroring subscript.
    "element_at": "try_element_at",
    # Presto zip pads to the longest array with NULLs, like arrays_zip
    "zip": "arrays_zip",
}

# date_add('unit', n, ts) / date_diff('unit', a, b) → Spark
# timestampadd/timestampdiff keep the argument order; only the quoted
# unit becomes a bare keyword.
_DATE_ADD = re.compile(r"\bdate_add\s*\(\s*'(\w+)'\s*,", re.IGNORECASE)
_DATE_DIFF = re.compile(r"\bdate_diff\s*\(\s*'(\w+)'\s*,", re.IGNORECASE)

# date_format(x, '%…') / date_parse(x, '%…'): translate the MySQL
# pattern literal to a Java pattern (DateTimeFunctions.java tokens).
# first arg may nest calls three levels deep and contain string
# literals, e.g. date_format(TIMESTAMP '2024-02-29 13:05:00', '%Y-%m')
_LIT = r"'(?:[^']|'')*'"
_ATOM = rf"(?:[^()']|{_LIT})"
_ARG = rf"(?:{_ATOM}|\((?:{_ATOM}|\((?:{_ATOM}|\({_ATOM}*\))*\))*\))*"
_DATE_FORMAT = re.compile(
    rf"\b(date_format|date_parse)\s*\(({_ARG}),\s*'([^']*)'\s*\)",
    re.IGNORECASE,
)


def _rename(sql: str, presto: str, spark: str) -> str:
    if spark == "":
        # drop the call, keep the argument: json_parse(x) -> (x)
        return re.sub(rf"\b{presto}\s*\(", "(", sql, flags=re.IGNORECASE)
    return re.sub(rf"\b{presto}\s*\(", f"{spark}(", sql, flags=re.IGNORECASE)


_STRING_LIT = re.compile(r"'(?:[^']|'')*'")


# --- paren-aware rewrites (TRY / UNNEST / weighted approx_percentile) -------
# These constructs need argument splitting, which token regexes can't do
# reliably; a tiny quote/paren scanner handles them.


def _scan_balanced(sql: str, open_idx: int) -> tuple[int, list[str]]:
    """From ``sql[open_idx] == '('``, return (index after the matching
    ')', top-level comma-split argument list).  Respects nested parens,
    brackets, and single-quoted literals."""
    depth = 0
    args: list[str] = []
    cur: list[str] = []
    i = open_idx
    n = len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            cur.append(sql[i : j + 1])
            i = j + 1
            continue
        if ch in "([":
            depth += 1
            if depth > 1:
                cur.append(ch)
        elif ch in ")]":
            depth -= 1
            if depth == 0:
                args.append("".join(cur).strip())
                return i + 1, [a for a in args if a != ""] or [""]
            cur.append(ch)
        elif ch == "," and depth == 1:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    raise ValueError(f"unbalanced parentheses in SQL near offset {open_idx}")


def _rewrite_calls(sql: str, name: str, fn) -> str:
    """Replace every ``name(...)`` call with ``fn(args) -> str``."""
    pat = re.compile(rf"\b{name}\s*\(", re.IGNORECASE)
    out = sql
    pos = 0
    while True:
        m = pat.search(out, pos)
        if not m:
            return out
        end, args = _scan_balanced(out, m.end() - 1)
        repl = fn(args)
        if repl is None:  # leave this call untouched
            pos = m.end()
            continue
        out = out[: m.start()] + repl + out[end:]
        pos = m.start() + len(repl)


def _rewrite_calls_window_aware(sql: str, name: str, fn, windowed_fn) -> str:
    """Like _rewrite_calls, but a call followed by an OVER clause routes
    to ``windowed_fn`` (forms that collect into arrays cannot take a
    window frame; the interpolating natives can)."""
    pat = re.compile(rf"\b{name}\s*\(", re.IGNORECASE)
    out = sql
    pos = 0
    while True:
        m = pat.search(out, pos)
        if not m:
            return out
        end, args = _scan_balanced(out, m.end() - 1)
        windowed = re.match(r"\s*OVER\b", out[end:], re.IGNORECASE)
        repl = (windowed_fn if windowed else fn)(args)
        if repl is None:  # leave this call untouched
            pos = m.end()
            continue
        out = out[: m.start()] + repl + out[end:]
        pos = m.start() + len(repl)


_TOP_OPS = ("/", "*", "+", "-")


def _split_top_binary(expr: str) -> tuple[str, str, str] | None:
    """Split a top-level binary arithmetic expr into (lhs, op, rhs); None
    if there is no single top-level operator (or it looks unary)."""
    depth = 0
    i = 0
    n = len(expr)
    while i < n:
        ch = expr[i]
        if ch == "'":
            j = expr.find("'", i + 1)
            i = (j if j != -1 else n) + 1
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif depth == 0 and ch in _TOP_OPS:
            lhs, rhs = expr[:i].strip(), expr[i + 1 :].strip()
            if lhs and rhs:  # unary +/- has an empty lhs
                return lhs, ch, rhs
        i += 1
    return None


_TRY_FNS = {"/": "try_divide", "*": "try_multiply", "+": "try_add", "-": "try_subtract"}

_CMP_OPS = ("!=", "<>", "<=", ">=", "=", "<", ">")


def _split_top_comparison(expr: str) -> tuple[str, str, str] | None:
    """Split at a top-level comparison operator (quote/paren aware)."""
    depth = 0
    i, n = 0, len(expr)
    while i < n:
        ch = expr[i]
        if ch == "'":
            j = expr.find("'", i + 1)
            i = (j if j != -1 else n) + 1
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif depth == 0:
            for op in _CMP_OPS:
                if expr.startswith(op, i):
                    lhs, rhs = expr[:i].strip(), expr[i + len(op) :].strip()
                    if lhs and rhs and not lhs.endswith(("<", ">", "!", "=")):
                        return lhs, op, rhs
                    break
        i += 1
    return None


def _split_top_boolean(expr: str) -> tuple[str, str, str] | None:
    """Split at the last top-level OR (else AND) — quote/paren aware."""
    best = None
    depth = 0
    i, n = 0, len(expr)
    while i < n:
        ch = expr[i]
        if ch == "'":
            j = expr.find("'", i + 1)
            i = (j if j != -1 else n) + 1
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif depth == 0 and (ch in "OoAa"):
            m = re.match(r"(?i)(OR|AND)\b", expr[i:])
            if m and i > 0 and not (expr[i - 1].isalnum() or expr[i - 1] == "_"):
                op = m.group(1).upper()
                lhs, rhs = expr[:i].strip(), expr[i + len(op) :].strip()
                if lhs and rhs:
                    if op == "OR":
                        best = (lhs, op, rhs)  # OR binds loosest — prefer
                    elif best is None:
                        best = (lhs, op, rhs)
                i += m.end()
                continue
        i += 1
    return best


def _try_rewrite(args: list[str], literals: list[str] | None = None) -> str:
    """TRY(expr) → NULL-on-error (reference scalar/TryFunction.java).

    Spark has no generic TRY; the shim lowers the reference's documented
    uses: TRY(CAST ..) → TRY_CAST, arithmetic → try_add/subtract/
    multiply/divide, element_at → try_element_at, to_number-ish casts.
    """
    if len(args) != 1:
        raise ValueError("TRY takes exactly one argument")
    inner = args[0].strip()
    low = inner.lower()
    # OR/AND distribute (TryExpressionRewriter evaluates the whole
    # boolean; a side that errors NULLs it).  Caveat: distribution keeps
    # short-circuit wins (NULL OR TRUE = TRUE where Presto yields NULL
    # only if it evaluated the erroring side) — the reference's own
    # suite shapes agree with the distributed form.
    bm = _split_top_boolean(inner)
    if bm:
        lhs, op, rhs = bm
        return (
            f"({_try_rewrite([lhs], literals)} {op} "
            f"{_try_rewrite([rhs], literals)})"
        )
    # a top-level comparison distributes TRY over both sides
    # (TRY(1/(b-a) != 1000): the failable arithmetic is inside)
    cm = _split_top_comparison(inner)
    if cm:
        lhs, op, rhs = cm
        return (
            f"({_try_rewrite([lhs], literals)} {op} "
            f"{_try_rewrite([rhs], literals)})"
        )
    # the CAST/element_at fast paths only apply when the call IS the
    # whole TRY operand — TRY(CAST(..) / y) must take the arithmetic
    # branch below, not TRY_CAST the left operand
    split = _split_top_binary(inner)
    if re.match(r"cast\s*\(", low) and not split:
        return "TRY_" + inner[inner.lower().index("cast") :]
    if re.match(r"element_at\s*\(", low) and not split:
        return "try_" + inner
    if split:
        lhs, op, rhs = split
        if (
            op == "/"
            and _STATIC_INTEGRAL_OPERAND.match(lhs)
            and _STATIC_INTEGRAL_OPERAND.match(rhs)
        ):
            # Presto integer division stays integral under TRY
            # (TryFunction + IntegerOperators.divide); a zero divisor
            # NULLs via nullif instead of raising
            if re.fullmatch(r"\d+", rhs.strip()):
                if int(rhs) == 0:
                    return "CAST(NULL AS INT)"
                return f"({lhs} DIV {rhs})"
            return f"({lhs} DIV nullif({rhs}, 0))"
        return f"{_TRY_FNS[op]}({lhs}, {rhs})"
    # TRY(ABS(x)) can only fail on BIGINT-min overflow: |x| == sign(x)*x
    # under try_multiply NULLs exactly that case
    am = re.fullmatch(r"abs\s*\((.*)\)", inner, re.IGNORECASE | re.DOTALL)
    if am:
        e = am.group(1)
        return f"try_multiply(CAST(sign({e}) AS BIGINT), {e})"
    # TRY over a JSON literal / json_parse(literal): the reference
    # parses eagerly (JsonFunctions.jsonParse) so invalid text NULLs
    # under TRY — statically decidable for literal arguments
    jm = re.fullmatch(
        r"(?:JSON\s+(\x00\d+\x00)|json_parse\s*\(\s*(\x00\d+\x00)\s*\))",
        inner,
        re.IGNORECASE,
    )
    if jm and literals is not None:
        import json as _json

        idx = int((jm.group(1) or jm.group(2)).strip("\x00"))
        content = literals[idx][1:-1].replace("''", "'")
        try:
            _json.loads(content)
        except ValueError:
            return "CAST(NULL AS STRING)"
        return f"({inner})"
    # TRY(MAP(keys, values)): a NULL key is the failure mode
    # (MapConstructor "map key cannot be null") — guard it to NULL
    if re.match(r"MAP\s*\(", inner, re.IGNORECASE) and inner.endswith(")") and not split:
        _, parts = _scan_balanced(inner, inner.index("("))
        if len(parts) == 2:
            k = parts[0].strip()
            return (
                f"(CASE WHEN exists({k}, __nk -> __nk IS NULL) "
                f"THEN NULL ELSE {inner} END)"
            )
    # TRY(to_base(x, radix)): the only runtime failure is radix outside
    # [2, 36] (MathFunctions.toBase checkRadix) — guard instead
    if re.match(r"to_base\s*\(", low) and inner.endswith(")") and not split:
        _, parts = _scan_balanced(inner, inner.index("("))
        if len(parts) == 2:
            x, r = parts[0].strip(), parts[1].strip()
            return (
                f"(CASE WHEN ({r}) BETWEEN 2 AND 36 "
                f"THEN to_base({x}, {r}) ELSE CAST(NULL AS STRING) END)"
            )
    # total functions cannot fail — pass through
    if re.fullmatch(
        r"(?i)current_timestamp|current_date|localtimestamp", inner
    ) or (
        re.match(r"(?i)(from_unixtime|to_unixtime)\s*\(", inner)
        and inner.endswith(")")
        and not split
    ):
        return f"({inner})"
    # constants cannot fail — TRY(c) == c (TryFunction.java semantics);
    # an array(..) constructor over constants likewise
    if re.fullmatch(
        r"(?:\w+\s+)?\x00\d+\x00|[-+]?[\d.]+(?:[eE][+-]?\d+)?"
        r"|TRUE|FALSE|NULL",
        inner,
        re.IGNORECASE,
    ) or (re.match(r"array\s*\(", inner, re.IGNORECASE) and inner.endswith(")")):
        return f"({inner})"
    raise ValueError(
        f"TRY({inner}) not translatable: the shim supports TRY over CAST, "
        "+ - * /, and element_at; wrap other expressions with try_cast or "
        "use the DataFrame API"
    )


def _approx_distinct_rewrite(args: list[str]) -> str | None:
    """approx_distinct(x[, err]) — the default-bucket form (2048 buckets;
    err omitted or mapping to 2048 via the reference's
    standardErrorToBuckets: log2ceil(ceil(1.0816/err²)),
    ApproximateCountDistinctAggregation.java:121) routes to the
    bit-exact airlift-parity NATIVE plan (_approx_distinct_native).
    Other bucket counts (rare; the reference suite never uses one) keep
    Spark's native estimator with the rsd passthrough."""
    if len(args) == 1:
        return _approx_distinct_native(args[0])
    if len(args) == 2:
        m = re.fullmatch(r"\s*([0-9]*\.?[0-9]+(?:[eE][+-]?\d+)?)\s*", args[1])
        if m:
            err = float(m.group(1))
            if 0.0040625 <= err <= 0.26:
                buckets = 1 << (math.ceil(1.0816 / (err * err)) - 1).bit_length()
                if buckets == 2048:
                    return _approx_distinct_native(args[0])
            return f"approx_count_distinct({args[0]}, {args[1]})"
        return f"approx_count_distinct({', '.join(args)})"
    return None


def _typeof_spelling_compat(sql: str) -> str:
    """TypeOfFunction.java: Presto type-name spellings (integer/varchar/
    unknown, parenthesized containers) from Spark's typeof.  Context-
    aware so translate() stays idempotent: a typeof immediately inside
    ``translate(`` is this pass's OWN prior expansion (or an equivalent
    user form) and is left alone."""
    out = sql
    pos = 0
    pat = re.compile(r"(?i)\btypeof\s*\(")
    while True:
        m = pat.search(out, pos)
        if not m:
            return out
        before = out[: m.start()].rstrip()
        if before.lower().endswith("translate("):
            pos = m.end()
            continue
        open_idx = out.index("(", m.start())
        end, _ = _scan_balanced(out, open_idx)
        arg = out[open_idx + 1 : end - 1]
        repl = (
            "regexp_replace(regexp_replace(regexp_replace("
            f"translate(typeof({arg}), '<>', '()'),"
            " '\\bint\\b', 'integer'), '\\bstring\\b', 'varchar'),"
            " '\\bvoid\\b', 'unknown')"
        )
        out = out[: m.start()] + repl + out[end:]
        pos = m.start() + len(repl)


def _native_checksum(args: list[str]) -> str:
    """The engine's documented cross-engine checksum CONVENTION (XOR of
    60-bit md5-prefix row hashes) — used where the pandas parity UDAF
    cannot run (mixed/windowed aggregations).  Known wart: this form is
    BIGINT while the parity UDAF is VARBINARY, so checksum values from
    mixed and unmixed contexts are not mutually comparable (they never
    were value-equal either; cross-context checksum joins are out of
    contract — documented in COVERAGE)."""
    return (
        f"bit_xor(CAST(conv(substr(md5(CAST({args[0]} AS STRING)), 1, 15),"
        " 16, 10) AS BIGINT))"
    )


# ---- native-plan parity lowering (round 8) ---------------------------
# approx_distinct / checksum / cardinality(approx_set(x)) lower onto
# NATIVE Spark aggregates over one Arrow-vectorized hash column
# (functions/hll.py register_native_parity_support), so the physical
# plan is the 100 TB shape: map-side partial aggregation, one shuffle,
# per-group state bounded at 2^p (bucket, rho) pairs — never a
# GROUPED_AGG pandas UDAF materializing a group's raw values in one
# Python worker.  Because every aggregate is a JVM aggregate the forms
# mix freely with count/sum/etc. (the round-7 mixed-query deviation is
# gone) and global aggregation over EMPTY input emits Presto's one row.

_HLL_SPARSE_PREFIX_BITS = 26  # functions/hll.py SPARSE_PREFIX_BITS


def _hll_native_pieces(arg: str, p: int, hash_fn: str) -> tuple[str, str]:
    """(count-distinct-prefix expr, collect_set-of-registers expr) for
    one parity aggregation over ``arg``.  The three references to the
    hash call are CSE'd by Catalyst into a single ArrowEvalPython."""
    h = f"{hash_fn}({arg}, typeof({arg}), ({arg}) IS NULL)"
    p26 = f"shiftrightunsigned({h}, {64 - _HLL_SPARSE_PREFIX_BITS})"
    bkt = f"CAST(shiftrightunsigned({h}, {64 - p}) AS INT)"
    # rho = leading zeros of (h << p | sentinel) + 1; bit_length computed
    # EXACTLY as length(conv(v, 10, 2)) — conv renders the unsigned
    # 64-bit binary string with no float rounding (same device as
    # hll.approx_distinct_by_group)
    rho = (
        f"CAST(64 - length(conv(shiftleft({h}, {p}) |"
        f" {1 << (p - 1)}, 10, 2)) + 1 AS INT)"
    )
    return (
        f"count(DISTINCT {p26})",
        f"collect_set(named_struct('b', {bkt}, 'r', {rho}))",
    )


def _approx_distinct_native(arg: str, p: int = 11) -> str:
    n, st = _hll_native_pieces(arg, p, "presto_hll_hash")
    # Presto's approx_distinct over empty / all-NULL input is 0
    return f"coalesce(presto_hll_estimate({p}, {n}, {st}), 0)"


def _approx_set_card_native(arg: str) -> str:
    # p=12: ApproximateSetAggregation's 4096 buckets, fed by airlift's
    # internal Murmur3; empty / all-NULL input yields NULL (the NULL
    # sketch), hence no coalesce
    n, st = _hll_native_pieces(arg, 12, "presto_hll_hash_m3")
    return f"presto_hll_estimate(12, {n}, {st})"


def _approx_set_card_native_dense(arg: str) -> str:
    # cardinality(CAST(approx_set(x) AS P4HYPERLOGLOG)): the dense-only
    # representation (spi/type/P4HyperLogLogType, airlift
    # HyperLogLog.makeDense) — same hash/bucket/rho pipeline, estimator
    # forced past the sparse linear-count branch (testP4ApproxSet* pins
    # where its values diverge from the sparse ones)
    n, st = _hll_native_pieces(arg, 12, "presto_hll_hash_m3")
    return f"presto_hll_estimate_dense(12, {n}, {st})"


# serialized empty p=12 sparse sketch (HyperLogLogFunctions.emptyApproxSet):
# SPARSE_V2 tag, indexBitLength 12, zero entries — functions/hll_sketch.py
_EMPTY_SKETCH_LIT = "X'020C0000'"


def _approx_set_pack_native(arg: str) -> str:
    """Bare ``approx_set(x)`` (a sketch VALUE, not its cardinality):
    the same native composite as the estimate path plus the exact
    sparse payload — count(DISTINCT prefix26) picks the representation,
    collect_set((bucket, rho)) (<= 2^12 entries) builds the dense file,
    collect_set(packed 32-bit airlift entry) carries the sparse set —
    finished by the scalar presto_hll_pack into airlift SPARSE_V2 /
    DENSE_V2 bytes (functions/hll_sketch.py).  The packed sketch merged
    later reproduces the single-level estimate bit-exactly (same
    cutoff, same estimator)."""
    n, st = _hll_native_pieces(arg, 12, "presto_hll_hash_m3")
    h = f"presto_hll_hash_m3({arg}, typeof({arg}), ({arg}) IS NULL)"
    p26 = f"shiftrightunsigned({h}, {64 - _HLL_SPARSE_PREFIX_BITS})"
    v26 = (
        f"CAST(64 - length(conv(shiftleft({h}, {_HLL_SPARSE_PREFIX_BITS}) |"
        f" {1 << (_HLL_SPARSE_PREFIX_BITS - 1)}, 10, 2)) + 1 AS BIGINT)"
    )
    entry = f"(shiftleft({p26}, 6) | {v26})"
    return f"presto_hll_pack(12, {n}, {st}, collect_set({entry}))"


def _merge_create_hll_fuse(sql: str) -> str:
    """merge(create_hll(E)) == approx_set(E): merging per-row singleton
    sketches IS accumulating one sketch (presto-tests CreateHll.java:28
    builds HyperLogLog(4096).add(value) per row; testMergeHyperLogLog*
    assert the fused values), and the fused spelling lowers to the
    native p=12 parity plan instead of a per-row-singleton merge."""
    pat = re.compile(r"(?i)\bmerge\s*\(\s*create_hll\s*\(")
    pos = 0
    while True:
        m = pat.search(sql, pos)
        if not m:
            return sql
        outer_open = sql.index("(", m.start())
        outer_end, _ = _scan_balanced(sql, outer_open)
        inner_open = sql.index("(", m.end() - 1)
        inner_end, _ = _scan_balanced(sql, inner_open)
        if sql[inner_end : outer_end - 1].strip():
            pos = m.end()  # extra expression around create_hll: leave
            continue
        arg = sql[inner_open + 1 : inner_end - 1]
        sql = sql[: m.start()] + f"approx_set({arg})" + sql[outer_end:]
        pos = m.start()


def _checksum_native_parity(arg: str, over: str = "") -> str:
    """ChecksumAggregationFunction parity as native sums: the per-row
    contribution m = Type.hash(x) * PRIME64 (PRIME64 for NULL, one
    scalar pandas UDF) splits into 32-bit halves summed as
    DECIMAL(38,0) — exact at any row count — and the finish UDF folds
    the wrapping 64-bit total to the 8 LE VARBINARY bytes.  ``over``
    carries a window clause (" OVER (..)"), applied to each sum, so
    windowed checksum is parity too."""
    m = f"presto_checksum_row({arg}, typeof({arg}), ({arg}) IS NULL)"
    lo = f"sum(CAST(({m} & 4294967295) AS DECIMAL(38,0))){over}"
    hi = f"sum(CAST(shiftrightunsigned({m}, 32) AS DECIMAL(38,0))){over}"
    return f"presto_checksum_finish({lo}, {hi})"


def _over_clause(sql: str, end: int) -> tuple[str | None, int]:
    """The window clause following a call span, if any: returns
    (" OVER (..)" / " OVER name" text, end index past it)."""
    m = re.match(r"\s*OVER\s*", sql[end:], re.IGNORECASE)
    if not m:
        return None, end
    i = end + m.end()
    if i < len(sql) and sql[i] == "(":
        oend, _ = _scan_balanced(sql, i)
        return sql[end:oend], oend
    mm = re.match(r"[A-Za-z_]\w*", sql[i:])
    if mm:
        return sql[end : i + mm.end()], i + mm.end()
    return None, end


_SKETCH_SCAN = re.compile(
    r"(?i)\b(cardinality|merge|approx_set|create_hll|empty_approx_set"
    r"|hll_cardinality|approx_distinct|checksum)\s*\("
)


def _parity_agg_compat(sql: str) -> str:
    """Lower the HLL/checksum parity surface onto native-plan forms.

    Handled per query level (nested ``(SELECT ..)`` bodies masked out —
    they belong to THEIR level, already processed by the recursion):

      approx_distinct(x)                → native p=11 estimate composite
      checksum(x) [OVER w]              → native DECIMAL(38,0) sums
      cardinality(approx_set(x))        → native p=12 estimate composite
      cardinality(cast(approx_set(x) AS P4HYPERLOGLOG))
                                        → dense-forced estimate
      approx_set(x)                     → airlift-format sketch BINARY
                                          (native composite + pack UDF)
      merge(X) / cardinality(merge(X))  → collect_list(X) + scalar merge
                                          finisher (X = sketch column /
                                          expression from another level)
      create_hll(x)                     → per-row singleton sketch
      empty_approx_set()                → serialized empty-sketch literal
      hll_cardinality(X)                → scalar sketch cardinality
                                          (engine spelling: SQL has no
                                          type info to overload
                                          cardinality on a bare column)
      merge(create_hll(x))              → fused to approx_set(x) first

    Error parity: ``merge(approx_set(x))`` in ONE level is invalid
    upstream (AggregationAnalyzer.java:324 "Cannot nest aggregations
    inside aggregation") and raises here instead of silently lowering —
    the legitimate spelling builds the sketch in an inner query level.
    Windowed approx_distinct keeps Spark's native estimator
    (count(DISTINCT ..) cannot run in a frame); windowed checksum and
    windowed merge ARE parity (their sums / collect_list take the
    window clause)."""
    sql = _merge_create_hll_fuse(sql)
    # mask nested (SELECT ..) spans — positions preserved
    scope = sql
    while True:
        m = _PSELECT.search(scope)
        if not m:
            break
        end, _ = _scan_balanced(scope, m.start())
        scope = scope[: m.start()] + " " * (end - m.start()) + scope[end:]

    def head(text: str, *names: str):
        """Anchored 'name ( name ( ..' chain at the start of the MASKED
        text; returns the index just past the last open paren, else
        None."""
        i = 0
        for nm in names:
            m2 = re.match(rf"(?i)\s*{nm}\s*\(", text[i:])
            if not m2:
                return None
            i += m2.end()
        return i

    out: list[str] = []
    last = 0  # original-sql position emitted so far
    pos = 0   # scan cursor

    def emit(s: int, repl: str, new_last: int) -> None:
        nonlocal last
        out.append(sql[last:s])
        out.append(repl)
        last = new_last

    while True:
        m = _SKETCH_SCAN.search(scope, pos)
        if not m:
            break
        pos = m.end()
        s = m.start()
        if s < last:
            continue  # inside an already-rewritten span
        name = m.group(1).lower()
        open_idx = sql.index("(", m.end(1))
        e, _ = _scan_balanced(sql, open_idx)
        inner_sql = sql[open_idx + 1 : e - 1]
        inner_scope = scope[open_idx + 1 : e - 1]

        def nested_agg_error() -> None:
            raise ValueError(
                "Cannot nest aggregations inside aggregation 'merge': "
                f"[{inner_sql.strip()}] — the reference rejects this "
                "(AggregationAnalyzer.java:324); build the sketch in an "
                "inner query level and merge() the sketch column outside"
            )

        if name == "cardinality":
            hi = head(inner_scope, "merge", "approx_set")
            if hi is not None:
                a_end, _ = _scan_balanced(sql, open_idx + hi)
                inner_sql = sql[sql.index("(", open_idx + 1) + 1 : a_end]
                nested_agg_error()
            hi = head(inner_scope, "approx_set")
            if hi is not None:
                a_open = open_idx + hi  # == (open_idx+1) + (hi-1)
                a_end, _ = _scan_balanced(sql, a_open)
                if not sql[a_end : e - 1].strip():
                    args = [
                        x.strip()
                        for x in _split_top_level(sql[a_open + 1 : a_end - 1])
                    ]
                    if len(args) == 1:
                        emit(s, _approx_set_card_native(args[0]), e)
                continue
            hi = head(inner_scope, "cast", "approx_set")
            if hi is not None:
                a_open = open_idx + hi
                a_end, _ = _scan_balanced(sql, a_open)
                if re.match(
                    r"(?is)^\s*AS\s+P4HYPERLOGLOG\s*\)\s*$",
                    sql[a_end : e - 1],
                ):
                    args = [
                        x.strip()
                        for x in _split_top_level(sql[a_open + 1 : a_end - 1])
                    ]
                    if len(args) == 1:
                        emit(s, _approx_set_card_native_dense(args[0]), e)
                continue
            hi = head(inner_scope, "cast")
            if hi is not None:
                c_open = open_idx + hi
                c_end, _ = _scan_balanced(sql, c_open)
                body = sql[c_open + 1 : c_end - 1]
                mm = re.match(
                    r"(?is)^(.*)\s+AS\s+P4HYPERLOGLOG\s*$", body
                )
                if mm and not sql[c_end : e - 1].strip():
                    x = _parity_agg_compat(mm.group(1))
                    emit(
                        s,
                        f"presto_hll_card_scalar(presto_hll_force_dense({x}))",
                        e,
                    )
                continue
            hi = head(inner_scope, "merge")
            if hi is not None:
                m_open = open_idx + hi
                m_end, _ = _scan_balanced(sql, m_open)
                tail = sql[m_end : e - 1]
                inner_over, iend = _over_clause(sql, m_end)
                if not tail.strip():
                    x = _parity_agg_compat(sql[m_open + 1 : m_end - 1])
                    emit(
                        s,
                        f"presto_hll_merge_card_finish(collect_list({x}))",
                        e,
                    )
                elif inner_over is not None and not sql[iend : e - 1].strip():
                    # cardinality(merge(s) OVER w): the windowed merge
                    # yields a per-row sketch; collect_list carries the
                    # window clause, the fused finisher reads it
                    x = _parity_agg_compat(sql[m_open + 1 : m_end - 1])
                    emit(
                        s,
                        "presto_hll_merge_card_finish("
                        f"collect_list({x}){inner_over})",
                        e,
                    )
                continue
            if (
                head(inner_scope, "empty_approx_set") is not None
                or head(inner_scope, "create_hll") is not None
            ):
                n_open = sql.index("(", open_idx + 1)
                n_end, _ = _scan_balanced(sql, n_open)
                if not sql[n_end : e - 1].strip():
                    emit(
                        s,
                        "presto_hll_card_scalar("
                        f"{_parity_agg_compat(inner_sql)})",
                        e,
                    )
                continue
            continue  # generic cardinality (arrays/maps): untouched

        if name == "merge":
            if head(inner_scope, "approx_set") is not None:
                nested_agg_error()
            over, oend = _over_clause(sql, e)
            x = _parity_agg_compat(inner_sql)
            if over is not None:
                emit(
                    s,
                    f"presto_hll_merge_finish(collect_list({x}){over})",
                    oend,
                )
            else:
                emit(s, f"presto_hll_merge_finish(collect_list({x}))", e)
            continue

        if name == "approx_set":
            over, _oend = _over_clause(sql, e)
            if over is not None:
                continue  # windowed sketch build: leave (fails loud)
            args = [x.strip() for x in _split_top_level(inner_sql)]
            if len(args) != 1:
                emit(s, sql[s:e], e)
                continue
            emit(s, _approx_set_pack_native(args[0]), e)
            continue

        if name == "create_hll":
            args = [x.strip() for x in _split_top_level(inner_sql)]
            if len(args) != 1:
                emit(s, sql[s:e], e)
                continue
            a = args[0]
            emit(
                s,
                f"presto_create_hll({a}, typeof({a}), ({a}) IS NULL)",
                e,
            )
            continue

        if name == "empty_approx_set":
            if inner_sql.strip():
                emit(s, sql[s:e], e)
                continue
            emit(s, _EMPTY_SKETCH_LIT, e)
            continue

        if name == "hll_cardinality":
            emit(
                s,
                f"presto_hll_card_scalar({_parity_agg_compat(inner_sql)})",
                e,
            )
            continue

        # ---- approx_distinct / checksum (round-8 behavior preserved)
        over, oend = _over_clause(sql, e)
        args = [x.strip() for x in _split_top_level(inner_sql)]
        if name == "checksum":
            if len(args) != 1:
                emit(s, sql[s:e], e)
                continue
            emit(
                s,
                _checksum_native_parity(args[0], over or ""),
                oend if over else e,
            )
            continue
        if over is not None:
            # windowed approx_distinct: Spark's native estimator
            # (count(DISTINCT ..) cannot run in a window frame); the
            # OVER clause stays in place
            emit(s, f"approx_count_distinct({', '.join(args)})", e)
            continue
        repl = _approx_distinct_rewrite(args)
        emit(s, repl if repl is not None else sql[s:e], e)

    out.append(sql[last:])
    return _p4_cast_post("".join(out))


def _p4_cast_post(sql: str) -> str:
    """Standalone CAST(X AS P4HYPERLOGLOG) — a STORED dense sketch
    (airlift HyperLogLog.makeDense), e.g. 'CTAS dense sketches, merge
    later'.  Runs after the main scanner (which consumed the
    cardinality-wrapped forms), so X is already lowered; the cast
    becomes the force-dense conversion.  Without this the generic type
    map would render it CAST(x AS BINARY) — type-correct but silently
    keeping the SPARSE representation, whose later cardinality diverges
    from Presto's P4 value."""
    pat = re.compile(r"(?i)\bcast\s*\(")
    pos = 0
    while True:
        m = pat.search(sql, pos)
        if not m:
            return sql
        open_idx = sql.index("(", m.start())
        end, _ = _scan_balanced(sql, open_idx)
        body = sql[open_idx + 1 : end - 1]
        mm = re.match(r"(?is)^(.*)\s+AS\s+P4HYPERLOGLOG\s*$", body)
        if not mm:
            pos = m.end()
            continue
        sql = (
            sql[: m.start()]
            + f"presto_hll_force_dense({mm.group(1)})"
            + sql[end:]
        )
        pos = m.start()


def _qdigest_pick_unweighted(x: str, q: str) -> str:
    """airlift QuantileDigest selection over unit weights: the smallest
    element whose 1-based rank strictly exceeds q * N, clamped to
    [min, max] (QuantileDigest.getQuantiles: the first traversal node
    where the running sum EXCEEDS quantile * weightedCount; upper bound
    capped at the observed max).  All-native: collect + sort + index."""
    arr = f"sort_array(collect_list({x}))"
    n = f"size({arr})"
    # clamp spelled as CASE (not greatest/least: the NULL-propagation
    # wrap pass for those is not idempotent over emitted text)
    kr = f"CAST(floor(({q}) * {n}) + 1 AS INT)"
    k = (
        f"(CASE WHEN {kr} > {n} THEN {n}"
        f" WHEN {kr} < 1 THEN 1 ELSE {kr} END)"
    )
    return f"try_element_at({arr}, {k})"


def _qdigest_pick_weighted(x: str, w: str, q: str) -> str:
    """airlift QuantileDigest selection with weights: the smallest value
    whose cumulative weight strictly exceeds q * totalWeight —
    reproduced exactly (integer weights are exact in doubles) by a
    sort + fold.  The threshold rides in the fold's zero value so no
    aggregate is captured inside a lambda body; the whole expression is
    JVM-native, so it mixes freely with other aggregates."""
    pair = (
        f"IF(({x}) IS NULL, NULL,"
        f" named_struct('v', {x}, 'w', CAST({w} AS DOUBLE)))"
    )
    arr = f"sort_array(collect_list({pair}))"
    total = f"aggregate({arr}, CAST(0 AS DOUBLE), (__qa, __qe) -> __qa + __qe.w)"
    fold = (
        f"aggregate({arr},"
        f" named_struct('cum', CAST(0 AS DOUBLE), 'i', 0, 'k', 0,"
        f" 't', ({q}) * {total}),"
        f" (__qa, __qe) -> IF(__qa.k > 0, __qa,"
        f" IF(__qa.cum + __qe.w > __qa.t,"
        f" named_struct('cum', __qa.cum + __qe.w, 'i', __qa.i + 1,"
        f" 'k', __qa.i + 1, 't', __qa.t),"
        f" named_struct('cum', __qa.cum + __qe.w, 'i', __qa.i + 1,"
        f" 'k', 0, 't', __qa.t))),"
        f" __qa -> IF(__qa.k > 0, __qa.k, __qa.i))"
    )
    # floor-at-1 spelled as CASE (greatest's NULL wrap is not
    # idempotent over emitted text); an empty group gives index 0 ->
    # try_element_at NULL either way
    return (
        f"try_element_at({arr}, (CASE WHEN ({fold}) < 1 THEN 1"
        f" ELSE ({fold}) END)).v"
    )


def _approx_percentile_interp(args: list[str]) -> str | None:
    """The pre-round-8 interpolating forms — kept for windowed calls
    (the collected-fold form cannot take an OVER clause) and ARRAY
    percentile arguments."""
    if len(args) == 4:
        x, w, p, _acc = args
        return f"percentile({x}, {p}, CAST({w} AS BIGINT))"
    if len(args) == 3:
        x, w, p = args
        return f"percentile({x}, {p}, CAST({w} AS BIGINT))"
    if len(args) == 2:
        return f"percentile_approx({args[0]}, {args[1]}, 10000)"
    return None


def _approx_percentile_rewrite(args: list[str]) -> str | None:
    """approx_percentile(x, p), the weighted (x, w, p) spelling, and
    the accuracy variant (x, w, p, accuracy)
    (ApproximateLongPercentileAggregations.java overloads).

    Weighted scalar-percentile forms use the qdigest selection rule
    (member-element picks — matches the reference's asserted values,
    e.g. 9900 not 9899.01 for the 0.99/10000-sequence case); a
    non-foldable 2-arg fraction (a bare column — Spark's native
    percentile functions demand a constant) uses the unweighted rule
    with any_value(fraction).  ARRAY percentiles and foldable 2-arg
    fractions keep the native interpolating/approx forms."""
    if len(args) in (3, 4):
        x, w, p = args[0], args[1], args[2]
        if _ARRAY_CTOR_HEAD.match(p):
            return _approx_percentile_interp(args)
        return _qdigest_pick_weighted(x, w, p)
    if len(args) == 2:
        x, p = args
        # ARRAY fractions always stay native (the qdigest pick is a
        # scalar selection; percentile_approx accepts array percentages)
        if not _ARRAY_CTOR_HEAD.match(p) and _fraction_is_nonfoldable(p):
            return _qdigest_pick_unweighted(x, f"any_value({p})")
        return f"percentile_approx({x}, {p}, 10000)"
    return None


# an ARRAY fraction must be an actual constructor — ARRAY[..] / ARRAY(..)
# — not a column whose name merely starts with "array" (round-8 ADVICE:
# a fraction column `array_pct` must route to the qdigest pick, not be
# kept native where it fails NON_FOLDABLE_INPUT)
_ARRAY_CTOR_HEAD = re.compile(r"(?i)\s*array\s*[\[(]")

_FRACTION_CAST_HEAD = re.compile(r"(?i)\b(?:try_)?cast\s*\(")
_FRACTION_CAST_TYPE = re.compile(
    r"(?i)\bAS\s+(?:double(?:\s+precision)?|real|float|integer|int|bigint"
    r"|smallint|tinyint|decimal(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)"
)
_FRACTION_NUM_LIT = re.compile(r"\b\d+(?:\.\d*)?(?:[eE][+-]?\d+)?|\.\d+")


def _fraction_is_nonfoldable(p: str) -> bool:
    """True when the percentile fraction references any column-like
    identifier (bare column, arithmetic over a column, function of a
    column) — those must route to the qdigest selection rule with
    any_value(fraction); pure literals (with or without arithmetic /
    CAST decoration, which Catalyst constant-folds) stay on the native
    percentile path.  Identifiers are classified POSITIONALLY (round-8
    ADVICE): numeric literals (incl. scientific notation) are stripped
    first, CAST heads and ``AS <numeric type>`` tails are grammar —
    so a COLUMN that happens to be named ``double``/``e``/``cast`` is
    correctly column-dependent rather than mistaken for a literal."""
    if re.match(r"(?i)\s*(true|false)\b", p):
        return False
    s = _FRACTION_NUM_LIT.sub(" ", p)
    s = _FRACTION_CAST_HEAD.sub("(", s)
    s = _FRACTION_CAST_TYPE.sub(" ", s)
    idents = {tok.lower() for tok in re.findall(r"[A-Za-z_]\w*", s)}
    return bool(idents - {"null", "true", "false"})


# --- Presto type spellings inside CAST(... AS <type>) -----------------------
# ARRAY(T) → ARRAY<T>, MAP(K,V) → MAP<K,V>, ROW(a T, …) → STRUCT<a: T, …>,
# VARBINARY → BINARY, JSON/HYPERLOGLOG → engine representations.
_SIMPLE_TYPES = {
    "varchar": "STRING",  # bare varchar is unbounded in Presto; Spark's needs (n)
    "decimal": "DECIMAL(38,0)",  # Presto bare DECIMAL default (DecimalType)
    "varbinary": "BINARY",
    "json": "STRING",
    "hyperloglog": "BINARY",
    "p4hyperloglog": "BINARY",
    "double precision": "DOUBLE",
    "time with time zone": "STRING",
    "timestamp with time zone": "TIMESTAMP",
    "unknown": "STRING",  # Presto's NULL type (TypeRegistry UNKNOWN)
}


def _translate_type(t: str) -> str:
    t = t.strip()
    # multi-word type spellings may carry arbitrary interior whitespace
    # (TIMESTAMP \n WITH TIME ZONE) — normalize before the lookup
    low = re.sub(r"\s+", " ", t.lower())
    if low in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[low]
    m = re.match(r"(array|map|row)\s*\((.*)\)\s*$", t, re.IGNORECASE | re.DOTALL)
    if not m:
        # the reference tests also spell generics Spark-style
        # (ARRAY<TINYINT>, MAP<INTEGER, VARCHAR>) — translate the inner
        # types (bare VARCHAR needs Spark's STRING)
        mg = re.match(r"(array|map)\s*<(.*)>\s*$", t, re.IGNORECASE | re.DOTALL)
        if mg:
            parts, depth, buf = [], 0, ""
            for ch in mg.group(2):
                if ch in "<(":
                    depth += 1
                elif ch in ">)":
                    depth -= 1
                if ch == "," and depth == 0:
                    parts.append(buf)
                    buf = ""
                else:
                    buf += ch
            parts.append(buf)
            if mg.group(1).lower() == "array":
                return f"ARRAY<{_translate_type(parts[0].strip())}>"
            return (
                f"MAP<{_translate_type(parts[0].strip())},"
                f" {_translate_type(parts[1].strip())}>"
            )
        return t
    kind, inner = m.group(1).lower(), m.group(2)
    _, args = _scan_balanced(f"({inner})", 0)
    if kind == "array":
        return f"ARRAY<{_translate_type(args[0])}>"
    if kind == "map":
        return f"MAP<{_translate_type(args[0])}, {_translate_type(args[1])}>"
    fields = []
    for i, a in enumerate(args):
        fm = re.match(r"(\w+)\s+(.*)$", a.strip(), re.DOTALL)
        if fm and not re.fullmatch(
            r"(?:ARRAY|MAP|ROW|VARCHAR|CHAR|DECIMAL|DOUBLE|TIME|TIMESTAMP|INTERVAL)",
            fm.group(1),
            re.IGNORECASE,
        ):
            fields.append(f"{fm.group(1)}: {_translate_type(fm.group(2))}")
        else:
            # unnamed row field: Presto names them field0..fieldN
            # (RowType.java), which is also how JSON casts and field
            # accessors address them
            fields.append(f"field{i}: {_translate_type(a.strip())}")
    return f"STRUCT<{', '.join(fields)}>"


_AS_SPLIT = re.compile(r"\s+AS\s+", re.IGNORECASE)

# Presto rounds fractional → integral casts (HALF_UP away from zero:
# DoubleOperators.castToLong / DecimalCasts); Spark truncates.  The
# rewrite fires only when the source is STATICALLY fractional — a
# decimal/double literal, a DOUBLE/REAL typed literal, or a CAST whose
# own target type is DOUBLE/FLOAT/REAL/DECIMAL — so column references
# and huge-bigint strings are never routed through round().
_INTEGRAL_TYPES = {"bigint", "integer", "int", "smallint", "tinyint"}

# operands that are statically integral/boolean/string-literal: the
# plain Spark CAST already matches Presto (identity, 1/0, or strict
# Long.parseLong-style parse), so no rounding route is needed
_STATIC_INTEGRAL_SIMPLE = re.compile(
    r"^\s*(?:"
    r"[-+]?\d+"
    r"|\x00\d+\x00"
    r"|TRUE|FALSE|NULL"
    r"|(?:BIGINT|INTEGER|INT|SMALLINT|TINYINT)\s*\x00\d+\x00"
    r")\s*$",
    re.IGNORECASE | re.DOTALL,
)
_INTEGRAL_CAST_HEAD = re.compile(r"^\s*(?:TRY_)?CAST\s*\(", re.IGNORECASE)
_INTEGRAL_CAST_TAIL = re.compile(
    r"\bAS\s+(?:BIGINT|INTEGER|INT|SMALLINT|TINYINT|STRING"
    r"|DECIMAL\s*\(\s*38\s*,\s*0\s*\))\s*$",
    re.IGNORECASE,
)


def _static_integral_safe(expr: str) -> bool:
    """The operand is already integral — skip the HALF_UP rounding pivot —
    only when it is a bare integral literal/placeholder or a SINGLE
    balanced CAST to an integral type.  A compound expression that merely
    ENDS with an integral cast (``CAST(x AS DOUBLE) + CAST(y AS INTEGER)``)
    is NOT safe: Presto rounds its double result, Spark would truncate."""
    if _STATIC_INTEGRAL_SIMPLE.match(expr):
        return True
    m = _INTEGRAL_CAST_HEAD.match(expr)
    if not m:
        return False
    end, args = _scan_balanced(expr, m.end() - 1)
    if expr[end:].strip():
        return False  # top-level operators after the cast — compound expr
    return bool(args and _INTEGRAL_CAST_TAIL.search(args[-1]))


def _bool_shaped(expr: str) -> bool:
    """True when the operand is syntactically boolean at depth 0
    (comparison / logical operators) — boolean → integral casts must
    stay on the plain CAST path (boolean → DECIMAL is not a Spark
    coercion)."""
    depth = 0
    top: list[str] = []
    for ch in expr:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif depth == 0:
            top.append(ch)
    flat = "".join(top)
    if re.search(r"[<>=]", flat):
        return True
    return bool(
        re.search(
            r"^\s*NOT\b|\bAND\b|\bOR\b|\bIS\s+(?:NOT\s+)?NULL\b|\bBETWEEN\b"
            r"|\bLIKE\b|\bIN\b|\bEXISTS\b",
            flat,
            re.IGNORECASE,
        )
    )


_STATIC_FRACTIONAL = re.compile(
    r"^\s*(?:"
    r"[-+]?\d*\.\d+(?:[eE][+-]?\d+)?"
    r"|[-+]?\d+[eE][+-]?\d+"
    r"|(?:DOUBLE|REAL)\s*\x00\d+\x00"
    r"|(?:TRY_)?CAST\s*\(\s*\x00?\d*\x00?[^()]*\bAS\s+"
    r"(?:DOUBLE|FLOAT|REAL|DECIMAL\s*\([^()]*\))\s*\)"
    r")\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _cast_rewrite(args: list[str], try_: bool = False) -> str | None:
    """CAST(x AS <presto-type>) → Spark type spelling (recursive).
    CHAR(n) additionally space-pads on read (CharType.java: a CHAR value
    IS its padded form; Spark's CHAR reads back unpadded); VARCHAR(n)
    truncates to n (TestCharacterStringCasts); fractional → integral
    rounds (DoubleOperators.castToLong)."""
    if not args:
        return None
    # MAP<K, V> angle generics carry a comma the paren scanner splits on
    parts = _AS_SPLIT.split(", ".join(args) if len(args) > 1 else args[0])
    if len(parts) < 2:
        return None
    expr, typ = " AS ".join(parts[:-1]), parts[-1]
    typs = typ.strip()
    cm = re.fullmatch(r"char\s*\(\s*(\d+)\s*\)", typs, re.IGNORECASE)
    if cm:
        return f"rpad(CAST({expr} AS STRING), {cm.group(1)}, ' ')"
    if re.fullmatch(r"char", typs, re.IGNORECASE):
        # bare CHAR is CHAR(1) (CharParametricType default)
        return f"rpad(CAST({expr} AS STRING), 1, ' ')"
    vm = re.fullmatch(r"varchar\s*\(\s*(\d+)\s*\)", typs, re.IGNORECASE)
    if vm:
        # Presto CAST to varchar(n) truncates (VarcharOperators)
        return f"substr(CAST({expr} AS STRING), 1, {vm.group(1)})"
    if typs.lower() in _INTEGRAL_TYPES and not _static_integral_safe(expr):
        if _STATIC_FRACTIONAL.match(expr):
            return f"CAST(round({expr}) AS {typs})"
        if not _bool_shaped(expr):
            # runtime fractional → integral rounds HALF_UP in Presto
            # (DoubleOperators.castToLong uses Math.round; DecimalCasts);
            # Spark truncates.  DECIMAL(38,0) is the rounding pivot that
            # is exact for every integral input (no double precision
            # loss) and rounds HALF_UP for double/decimal inputs.
            t = "TRY_" if try_ else ""
            return f"{t}CAST({t}CAST({expr} AS DECIMAL(38,0)) AS {typs})"
    if typs.lower() == "ipaddress":
        # canonical textual form via the session-registered UDF
        # (IpAddressOperators.java; sql_support.ensure_sql_support)
        return f"__presto_ipaddress({expr})"
    # timestamp -> TIME takes the time-of-day (TimestampOperators
    # castToTime); Spark has no timestamp->TIME cast, so lower through
    # date_format.  Statically decidable only when the operand is a
    # known timestamp producer (head-anchored); Presto TIME is
    # millisecond precision.  TIME WITH TIME ZONE maps onto the same
    # session-zone time-of-day (engine convention: zones don't ride on
    # values; the session zone is the single zone).
    if re.fullmatch(
        r"time(\s+with\s+time\s+zone)?", typs, re.IGNORECASE
    ) and re.match(
        r"(?i)\s*(from_unixtime|timestamp_seconds|now|current_timestamp"
        r"|localtimestamp)\b",
        expr,
    ):
        return f"CAST(date_format({expr}, 'HH:mm:ss.SSS') AS TIME)"
    translated = _translate_type(typ)
    if translated == typs:
        return None  # nothing Presto-specific; leave untouched
    return f"CAST({expr} AS {translated})"


def _try_cast_rewrite(args: list[str]) -> str | None:
    out = _cast_rewrite(args, try_=True)
    if out is None:
        return None
    if out.upper().startswith(("CAST(", "TRY_CAST(")):
        return out if out.upper().startswith("TRY_") else "TRY_" + out
    # CHAR-pad form: the cast inside rpad becomes the TRY_CAST
    return out.replace("CAST(", "TRY_CAST(", 1)


# TABLESAMPLE BERNOULLI(p) / SYSTEM(p) (SqlBase.g4 sampleType) → Spark's
# TABLESAMPLE (p PERCENT); LIMIT ALL → no limit.
_TABLESAMPLE = re.compile(
    r"\bTABLESAMPLE\s+(?:BERNOULLI|SYSTEM)\s*\(\s*([0-9.]+)\s*\)", re.IGNORECASE
)
_LIMIT_ALL = re.compile(r"\bLIMIT\s+ALL\b", re.IGNORECASE)

_ARRAY_LIT = re.compile(r"\bARRAY\s*\[", re.IGNORECASE)


def _array_literals(sql: str) -> str:
    """Presto ARRAY[..] → Spark array(..)."""
    out = sql
    while True:
        m = _ARRAY_LIT.search(out)
        if not m:
            return out
        end, args = _scan_balanced(out, m.end() - 1)
        out = out[: m.start()] + "array(" + ", ".join(args) + ")" + out[end:]


_UNNEST = re.compile(
    r"(\bCROSS\s+JOIN\s+|,\s*)UNNEST\s*\(", re.IGNORECASE
)
_UNNEST_TAIL = re.compile(
    r"\s*(WITH\s+ORDINALITY\s*)?(?:AS\s+)?(\w+)\s*\(\s*([\w\s,]+?)\s*\)",
    re.IGNORECASE,
)


_UNNEST_FROM = re.compile(r"\bFROM\s+UNNEST\s*\(", re.IGNORECASE)
_RESERVED_AFTER_UNNEST = {
    "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "JOIN", "CROSS",
    "LEFT", "RIGHT", "FULL", "INNER", "ON", "UNION", "INTERSECT",
    "EXCEPT", "WITH", "ORDINALITY", "AND", "OR", "WINDOW",
}


def _unnest_from_alias(sql: str, pos: int):
    """Parse the optional ``[WITH ORDINALITY] [AS] t(c, ...)`` tail after
    a FROM-clause UNNEST; returns (end, ordinality, alias, cols)."""
    om = re.match(r"\s*WITH\s+ORDINALITY", sql[pos:], re.IGNORECASE)
    ordinality = bool(om)
    if om:
        pos += om.end()
    am = re.match(
        r"\s*(?:AS\s+)?(\w+)\s*\(\s*([\w\s,]+?)\s*\)", sql[pos:], re.IGNORECASE
    )
    if am and am.group(1).upper() not in _RESERVED_AFTER_UNNEST:
        cols = [c.strip() for c in am.group(2).split(",")]
        return pos + am.end(), ordinality, am.group(1), cols
    am2 = re.match(r"\s*AS\s+(\w+)\b", sql[pos:], re.IGNORECASE)
    if am2:
        return pos + am2.end(), ordinality, am2.group(1), None
    return pos, ordinality, None, None


def _unnest_from_rewrite(sql: str) -> str:
    """Bare ``FROM UNNEST(...) [WITH ORDINALITY] [AS t(c, ...)]`` — no
    preceding relation to lateral-view against, so lower to a derived
    table whose column ORDER is Presto's (values first, ordinality
    last); an alias column list renames positionally.

      UNNEST(a)                   → (SELECT explode(a))
      UNNEST(a1, a2)              → (SELECT inline(arrays_zip(a1, a2)))
      UNNEST(a) WITH ORDINALITY   → (SELECT col, pos + 1 FROM
                                     (SELECT posexplode(a) AS (pos, col)))
      UNNEST(a1, a2) WITH ORD...  → (SELECT __z.*, __p + 1 FROM (SELECT
                 posexplode(arrays_zip(a1, a2)) AS (__p, __z)))
      UNNEST(map) (2 alias cols)  → explode(map) (k, v twin columns)

    arrays_zip NULL-pads to the longest input, matching UnnestOperator's
    lockstep zip."""
    out = sql
    while True:
        m = _UNNEST_FROM.search(out)
        if not m:
            return out
        end, exprs = _scan_balanced(out, m.end() - 1)
        tail_end, ordinality, alias, cols = _unnest_from_alias(out, end)
        if ordinality:
            if len(exprs) == 1:
                body = (
                    f"(SELECT col, pos + 1 FROM "
                    f"(SELECT posexplode({exprs[0]}) AS (pos, col)))"
                )
                if cols is not None and len(cols) == 3:
                    # single MAP expr with ordinality: k, v, ord
                    body = (
                        f"(SELECT k, v, pos + 1 FROM "
                        f"(SELECT posexplode({exprs[0]}) AS (pos, k, v)))"
                    )
            else:
                body = (
                    f"(SELECT __z.*, __p + 1 FROM (SELECT "
                    f"posexplode(arrays_zip({', '.join(exprs)})) AS (__p, __z)))"
                )
        elif len(exprs) == 1:
            body = f"(SELECT explode({exprs[0]}))"
        else:
            body = f"(SELECT inline(arrays_zip({', '.join(exprs)})))"
        if alias and cols:
            suffix = f" AS {alias}({', '.join(cols)})"
        elif alias:
            suffix = f" AS {alias}"
        else:
            suffix = " AS __unnest"
        out = out[: m.start()] + "FROM " + body + suffix + out[tail_end:]


def _unnest_rewrite(sql: str) -> str:
    """FROM-clause UNNEST (SqlBase.g4:240) → LATERAL VIEW.

    - UNNEST(arr) AS t(x)                  → LATERAL VIEW explode(arr) t AS x
    - UNNEST(a1, a2) AS t(x, y)            → LATERAL VIEW inline(arrays_zip(a1, a2)) t AS x, y
    - UNNEST(map) AS t(k, v)               → LATERAL VIEW explode(map) t AS k, v
    - UNNEST(arr) WITH ORDINALITY AS t(x, i) →
        LATERAL VIEW explode(map_from_arrays(sequence(1, size(arr)), arr)) t AS i, x
      (1-based ordinality, matching the reference; Spark posexplode is
      0-based so the map trick keeps it engine-exact)

    Bare ``FROM UNNEST(...)`` (no preceding relation) lowers first via
    _unnest_from_rewrite.
    """
    out = _unnest_from_rewrite(sql)
    while True:
        m = _UNNEST.search(out)
        if not m:
            return out
        end, exprs = _scan_balanced(out, m.end() - 1)
        tail = _UNNEST_TAIL.match(out, end)
        if not tail or tail.group(2).upper() in _RESERVED_AFTER_UNNEST:
            # alias-less lateral UNNEST: Spark names the generator output
            # itself (col / key,value / pos,col) — nothing downstream can
            # reference the columns by name, so synthetic names suffice
            om = re.match(r"\s*WITH\s+ORDINALITY", out[end:], re.IGNORECASE)
            tail_end = end + (om.end() if om else 0)
            e = exprs[0] if len(exprs) == 1 else f"arrays_zip({', '.join(exprs)})"
            gen = (
                f"posexplode({e})" if om
                else (f"explode({e})" if len(exprs) == 1 else f"inline({e})")
            )
            out = (
                out[: m.start()]
                + f" LATERAL VIEW {gen} __unnest_{m.start()} "
                + out[tail_end:]
            )
            continue
        ordinal, alias, cols_s = tail.group(1), tail.group(2), tail.group(3)
        cols = [c.strip() for c in cols_s.split(",")]
        if ordinal:
            if len(exprs) != 1 or len(cols) != 2:
                raise ValueError(
                    "UNNEST WITH ORDINALITY shim supports a single array: "
                    "UNNEST(arr) WITH ORDINALITY AS t(elem, ord)"
                )
            e = exprs[0]
            view = (
                f"LATERAL VIEW explode(map_from_arrays(sequence(1, size({e})), {e})) "
                f"{alias} AS {cols[1]}, {cols[0]}"
            )
        elif len(exprs) == 1 and len(cols) == 1:
            view = f"LATERAL VIEW explode({exprs[0]}) {alias} AS {cols[0]}"
        elif len(exprs) == 1 and len(cols) == 2:
            # single expr, two columns => map unnest (k, v)
            view = f"LATERAL VIEW explode({exprs[0]}) {alias} AS {cols[0]}, {cols[1]}"
        elif len(exprs) == len(cols):
            # multi-array zip (UnnestOperator zips in lockstep)
            view = (
                f"LATERAL VIEW inline(arrays_zip({', '.join(exprs)})) "
                f"{alias} AS {', '.join(cols)}"
            )
        else:
            raise ValueError(
                f"UNNEST arity mismatch: {len(exprs)} expressions vs {len(cols)} columns"
            )
        out = out[: m.start()] + " " + view + out[tail.end() :]


# --- end-to-end suite surface (AbstractTestQueries.java shapes) --------------
# VALUES ROW(..) explicit row constructors, quantified comparisons
# (= ANY / <> ALL / <op> ALL|ANY|SOME), IN (VALUES ...), grouping()
# over plain GROUP BY / multi-argument, bare FROM UNNEST (handled in
# _unnest_rewrite below).

_VALUES_KW = re.compile(r"\bVALUES\b", re.IGNORECASE)


def _values_row_strip(sql: str) -> str:
    """``VALUES ROW (1, 2), ROW (3, 4)`` — the grammar's explicit row
    constructor (SqlBase.g4 rowValue) denotes a multi-column VALUES row,
    not a ROW-typed value; drop the keyword so the generic ROW() →
    named_struct pass can't wrap the row in a spurious struct
    (AbstractTestQueries.java testRowFieldAccessor shapes).  Runs on
    masked SQL.  ROW( nested inside a parenthesized item stays a struct
    constructor, exactly as in Presto."""
    out = sql
    pos = 0
    while True:
        m = _VALUES_KW.search(out, pos)
        if not m:
            return out
        i = m.end()
        while True:
            n = len(out)
            while i < n and out[i].isspace():
                i += 1
            # (ROW(..)) — the constructor also binds inside one layer of
            # item parens (testRowFieldAccessorInAggregate's array rows)
            pm = re.match(r"\(\s*ROW\s*\(", out[i:], re.IGNORECASE)
            if pm:
                inner_open = i + pm.end() - 1
                inner_end, _inner_args = _scan_balanced(out, inner_open)
                outer_end, _ = _scan_balanced(out, i)
                # StatementAnalyzer.visitValues decomposes ANY row-typed
                # row expression into its field types: (ROW(x)) is the
                # value x, (ROW(a, b)) is a TWO-column row — so unwrap
                # both parens + keyword regardless of arity
                if out[inner_end : outer_end - 1].strip() == "":
                    out = out[:i] + out[inner_open:inner_end] + out[outer_end:]
                    continue
            rm = re.match(r"ROW\s*\(", out[i:], re.IGNORECASE)
            if rm:
                open_idx = i + rm.end() - 1
                end, _ = _scan_balanced(out, open_idx)
                out = out[:i] + out[open_idx:]
                i = i + (end - open_idx)
            else:
                depth = 0
                while i < n:
                    ch = out[i]
                    if ch in "([":
                        depth += 1
                    elif ch in ")]":
                        if depth == 0:
                            break
                        depth -= 1
                    elif ch == "," and depth == 0:
                        break
                    i += 1
            n = len(out)
            j = i
            while j < n and out[j].isspace():
                j += 1
            if j < n and out[j] == ",":
                i = j + 1
                continue
            break
        pos = m.end()


_QUANT = re.compile(r"(<=|>=|<>|!=|=|<|>)\s*(ANY|ALL|SOME)\s*\(", re.IGNORECASE)

_NULL_BOOL = "CAST(NULL AS BOOLEAN)"


def _quantified_compat(sql: str) -> str:
    """Quantified comparisons (SqlBase.g4 quantifiedComparison;
    analyzer: TransformQuantifiedComparisonApplyToLateralJoin.java) —
    Spark has no ANY/ALL/SOME comparison syntax.

    ``= ANY`` → IN, ``<> ALL`` → NOT IN (exact three-valued semantics).
    Ordering quantifiers lower to ONE uncorrelated scalar subquery
    computing (count(*), count(c), min(c), max(c)) — the same shape the
    reference's rewrite produces — and a CASE that reproduces the ANSI
    three-valued result: empty set → TRUE for ALL / FALSE for ANY, a
    definitive FALSE/TRUE from the min/max comparison even when NULLs
    are present, NULL otherwise.  One aggregation pass over the
    subquery, no join — broadcast-friendly at any scale.

    The left operand is extracted with the single-operand scanner, so
    ``a + 1 > ALL (q)`` would mis-bind to ``1``; Presto's own suites
    only use simple operands on the left of a quantifier."""
    out = sql
    while True:
        m = _QUANT.search(out)
        if not m:
            return out
        op, quant = m.group(1), m.group(2).upper()
        if op == "!=":
            op = "<>"
        if quant == "SOME":
            quant = "ANY"
        end, _ = _scan_balanced(out, m.end() - 1)
        sub = out[m.end() : end - 1].strip()
        start = _left_operand_start(out, m.start())
        x = out[start : m.start()].strip()
        if not x:
            return out
        if op == "=" and quant == "ANY":
            repl = f"({x} IN ({sub}))"
        elif op == "<>" and quant == "ALL":
            repl = f"({x} NOT IN ({sub}))"
        else:
            s = (
                "(SELECT named_struct('n', count(*), 'nn', count(__qc), "
                f"'mn', min(__qc), 'mx', max(__qc)) FROM ({sub}) AS __qa(__qc))"
            )
            if quant == "ALL":
                empty = "TRUE"
                if op == "=":
                    core = (
                        f"WHEN {s}.mn <> {s}.mx THEN FALSE "
                        f"WHEN ({x}) <> {s}.mn THEN FALSE "
                        f"WHEN {s}.n > {s}.nn THEN {_NULL_BOOL} ELSE TRUE"
                    )
                else:
                    ext = f"{s}.mx" if op in (">", ">=") else f"{s}.mn"
                    core = (
                        f"WHEN NOT (({x}) {op} {ext}) THEN FALSE "
                        f"WHEN {s}.n > {s}.nn THEN {_NULL_BOOL} ELSE TRUE"
                    )
            else:
                empty = "FALSE"
                if op == "<>":
                    core = (
                        f"WHEN {s}.mn <> {s}.mx THEN TRUE "
                        f"WHEN ({x}) <> {s}.mn THEN TRUE "
                        f"WHEN {s}.n > {s}.nn THEN {_NULL_BOOL} ELSE FALSE"
                    )
                else:
                    ext = f"{s}.mn" if op in (">", ">=") else f"{s}.mx"
                    core = (
                        f"WHEN ({x}) {op} {ext} THEN TRUE "
                        f"WHEN {s}.n > {s}.nn THEN {_NULL_BOOL} ELSE FALSE"
                    )
            repl = (
                f"(CASE WHEN {s}.n = 0 THEN {empty} "
                f"WHEN ({x}) IS NULL THEN {_NULL_BOOL} "
                f"WHEN {s}.mx IS NULL THEN {_NULL_BOOL} "
                f"{core} END)"
            )
        out = out[:start] + repl + out[end:]


_IN_VALUES = re.compile(r"\b(IN)\s*\(\s*VALUES\b", re.IGNORECASE)


def _map_in_compat(sql: str) -> str:
    """``MAP(..) IN (VALUES MAP(..), ..)`` / ``MAP(..) IN (MAP(..), ..)``
    — Spark MAP values are not comparable (INVALID_ORDERING_TYPE);
    Presto compares maps by content (MapType / MapOperators.equals).
    Compare canonical entry lists instead — sort_array(map_entries(m))
    on both sides — statically detectable when the operand and every
    list item are MAP constructors."""
    out = sql
    pos = 0
    while True:
        m = re.search(r"(?i)\bMAP\s*\(", out[pos:])
        if not m:
            return out
        start = pos + m.start()
        open_idx = pos + m.end() - 1
        end, _ = _scan_balanced(out, open_idx)
        im = re.match(r"\s*(NOT\s+)?IN\s*\(", out[end:], re.IGNORECASE)
        if not im:
            pos = open_idx + 1  # still scan nested MAP( occurrences
            continue
        lstart = end + im.end() - 1
        lend, litems = _scan_balanced(out, lstart)
        inner = out[lstart + 1 : lend - 1].strip()
        vm = re.match(r"(?i)VALUES\b", inner)
        if vm:
            items = _split_top_level(inner[vm.end() :])
        else:
            items = litems
        stripped = [
            it.strip()[1:-1].strip()
            if it.strip().startswith("(") and it.strip().endswith(")")
            and not _top_level_comma(it.strip()[1:-1])
            else it.strip()
            for it in items
        ]
        if not all(re.match(r"(?i)MAP\s*\(", s) for s in stripped):
            pos = end
            continue
        wrapped = [f"sort_array(map_entries({s}))" for s in stripped]
        lhs = f"sort_array(map_entries({out[start:end]}))"
        neg = im.group(1) or ""
        if vm:
            repl = f"{lhs} {neg}IN (VALUES {', '.join(f'({w})' for w in wrapped)})"
        else:
            repl = f"{lhs} {neg}IN ({', '.join(wrapped)})"
        out = out[:start] + repl + out[lend:]
        pos = start + len(repl)


def _in_values_compat(sql: str) -> str:
    """``x IN (VALUES 1, 2)`` — Presto's grammar allows a VALUES body as
    the IN subquery; Spark needs an explicit SELECT wrapper."""
    out = sql
    pos = 0
    while True:
        m = _IN_VALUES.search(out, pos)
        if not m:
            return out
        open_idx = out.index("(", m.end(1))
        end, _ = _scan_balanced(out, open_idx)
        inner = out[open_idx + 1 : end - 1]
        # Spark needs a table alias on a parenthesized VALUES in FROM
        repl = f"(SELECT * FROM ({inner}) AS __v)"
        out = out[: open_idx] + repl + out[end:]
        pos = open_idx + len(repl)


_PSELECT = re.compile(r"\(\s*SELECT\b", re.IGNORECASE)

_SUBQ_CLAUSES = ("FROM", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT",
                 "UNION", "EXCEPT", "INTERSECT", "OFFSET", "FETCH", "WINDOW")


def _no_from_select(body: str):
    """For the text after SELECT inside a parenthesized subquery: if the
    query has no FROM (or any clause beyond an optional WHERE) at depth
    0, return (select_list, where_condition_or_None); else None."""
    depth = 0
    i, n = 0, len(body)
    while i < n:
        ch = body[i]
        if ch == "'":
            j = body.find("'", i + 1)
            i = (j if j != -1 else n) + 1
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif depth == 0 and (ch.isalpha() or ch == "_"):
            m = _CLAUSE_WORD.match(body, i)
            w = m.group(0).upper()
            if w == "WHERE":
                return body[:i], body[m.end() :]
            if w in _SUBQ_CLAUSES:
                return None
            i = m.end()
            continue
        i += 1
    return body, None


def _exists_no_from_compat(sql: str) -> str:
    """``EXISTS (SELECT .. [WHERE c])`` with no FROM — Presto evaluates
    the standalone SELECT (one row, filtered by c); Spark rejects EXISTS
    outside filter/join/projection positions (e.g. in ORDER BY).  The
    form folds exactly: no WHERE → TRUE, WHERE c → (c) IS TRUE."""
    out = sql
    pos = 0
    while True:
        m = re.search(r"\bEXISTS\s*\(\s*SELECT\b", out[pos:], re.IGNORECASE)
        if not m:
            return out
        start = pos + m.start()
        open_idx = out.index("(", start + 6)
        end, _ = _scan_balanced(out, open_idx)
        body = out[open_idx + 1 : end - 1]
        sm = re.match(r"\s*SELECT\b", body, re.IGNORECASE)
        parts = _no_from_select(body[sm.end() :])
        if parts is None:
            pos = end
            continue
        _items, cond = parts
        repl = "TRUE" if cond is None else f"(({cond.strip()}) IS TRUE)"
        out = out[:start] + repl + out[end:]
        pos = start + len(repl)


_COLLAPSE_SKIP_BEFORE = {
    "EXISTS", "FROM", "JOIN", "LATERAL", "UNION", "EXCEPT", "INTERSECT",
    "ALL", "ANY", "SOME", "IN", "TABLE", "AS",
}


# an aggregate call inside a no-FROM select item means the group is a
# real one-row aggregation query, not a foldable expression — collapsing
# or flattening it would re-scope the aggregate to the OUTER query
# (count() silently flips from per-row 0/1 to a global count)
_SCALAR_AGG_RE = re.compile(
    r"(?i)\b(count|sum|avg|min|max|array_agg|bool_and|bool_or"
    r"|every|arbitrary|any_value|stddev\w*|var\w*)\s*\("
)


def _item_has_own_agg(item: str) -> bool:
    """True when *item* contains an aggregate call that belongs to ITS
    query level — aggregates inside a nested ``(SELECT ..)`` span are
    that subquery's, and must not trigger the one-row-aggregation guard
    (e.g. the item ``(SELECT count(*) WHERE o.orderkey = 0)`` is a plain
    scalar-subquery expression, freely movable)."""
    masked = item
    while True:
        m = _PSELECT.search(masked)
        if not m:
            return bool(_SCALAR_AGG_RE.search(masked))
        end, _ = _scan_balanced(masked, m.start())
        masked = masked[: m.start()] + " " * (end - m.start()) + masked[end:]


def _trivial_scalar_subquery_collapse(sql: str) -> str:
    """``(SELECT expr)`` / ``(SELECT expr WHERE c)`` with no FROM — the
    reference's correlated shapes like ORDER BY (SELECT 2 * n.nationkey)
    or GROUP BY (SELECT l.orderkey) exceed Catalyst's subquery placement
    rules, but the no-FROM form folds exactly: the expression itself
    (NULL-when-filtered via CASE for the WHERE variant)."""
    out = sql
    pos = 0
    while True:
        m = _PSELECT.search(out, pos)
        if not m:
            return out
        before = out[: m.start()].rstrip()
        w = re.search(r"([A-Za-z_]\w*)$", before)
        if (not before) or (w and w.group(1).upper() in _COLLAPSE_SKIP_BEFORE):
            pos = m.end()
            continue
        # a comma-join derived table — `FROM a, (SELECT 1 AS x) b` — is a
        # relation, not a scalar; collapsing it breaks valid SQL
        if before.endswith(",") and _clause_at(out, m.start()) == "from":
            pos = m.end()
            continue
        end, _ = _scan_balanced(out, m.start())
        rest = out[end:].lstrip()
        # a set-op / ORDER BY right after the parens means the group is
        # a parenthesized QUERY, not a scalar (a trailing LIMIT belongs
        # to the enclosing query in the scalar positions Presto allows)
        if re.match(r"(?i)(UNION|EXCEPT|INTERSECT|ORDER)\b", rest):
            pos = m.end()
            continue
        body = out[m.start() + 1 : end - 1]
        sm = re.match(r"\s*SELECT\b", body, re.IGNORECASE)
        parts = _no_from_select(body[sm.end() :])
        if parts is None:
            pos = end
            continue
        items, cond = parts
        item = items.strip()
        if (
            not item
            or item == "*"
            or re.match(r"(?i)DISTINCT\b", item)
            or _top_level_comma(item)
            # an aggregate makes it a real one-row aggregation query
            # (SELECT count(*) WHERE c) — leave it to Spark's subquery
            or _SCALAR_AGG_RE.search(item)
        ):
            pos = end
            continue
        repl = (
            f"({item})"
            if cond is None
            else f"(CASE WHEN ({cond.strip()}) THEN {item} END)"
        )
        out = out[: m.start()] + repl + out[end:]
        # stay at the same position: the collapsed item may itself hold
        # a nested (SELECT ..) that now becomes outermost


def _top_level_comma(expr: str) -> bool:
    depth = 0
    i, n = 0, len(expr)
    while i < n:
        ch = expr[i]
        if ch == "'":
            j = expr.find("'", i + 1)
            i = (j if j != -1 else n) + 1
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            return True
        i += 1
    return False


def _split_top_level(text: str) -> list[str]:
    """Split on depth-0 commas (paren/bracket aware, quote-naive callers
    must pre-mask literals or accept comma-free literal content)."""
    items, buf, depth = [], [], 0
    for ch in text:
        if ch == "," and depth == 0:
            items.append("".join(buf))
            buf = []
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        buf.append(ch)
    items.append("".join(buf))
    return items


def _derived_scalar_wrapper_flatten(sql: str) -> str:
    """``(SELECT * FROM (SELECT <item>))`` — a scalar subquery whose body
    is only a derived-table wrapper around one no-FROM select item
    (AbstractTestQueries' "correlation two levels deep" shapes).  Presto
    decorrelates through the wrapper (PlanNodeDecorrelator.java); Spark
    cannot resolve an outer column through two subquery levels.  The
    wrapper adds nothing — flatten to ``(<item>)``, which Spark's own
    single-level decorrelation (or the later no-FROM folds) then handles."""
    pat = re.compile(r"\(\s*SELECT\s+\*\s+FROM\s*\(\s*SELECT\b", re.IGNORECASE)
    out = sql
    pos = 0
    while True:
        m = pat.search(out, pos)
        if not m:
            return out
        # in FROM position the group is a derived TABLE, not a scalar
        # subquery — flattening it would orphan its alias
        before = out[: m.start()].rstrip()
        w = re.search(r"([A-Za-z_]\w*)$", before)
        if (w and w.group(1).upper() in _COLLAPSE_SKIP_BEFORE) or (
            before.endswith(",") and _clause_at(out, m.start()) == "from"
        ):
            pos = m.end()
            continue
        outer_open = m.start()
        inner_open = out.rindex("(", outer_open + 1, m.end())
        inner_end, _ = _scan_balanced(out, inner_open)
        outer_end, _ = _scan_balanced(out, outer_open)
        # the inner group must close the outer subquery (no alias or
        # trailing clauses), and its body be a single no-WHERE item
        if out[inner_end : outer_end - 1].strip():
            pos = m.end()
            continue
        body = out[inner_open + 1 : inner_end - 1]
        sm = re.match(r"\s*SELECT\b", body, re.IGNORECASE)
        parts = _no_from_select(body[sm.end() :])
        if parts is None or parts[1] is not None or _top_level_comma(parts[0]):
            pos = m.end()
            continue
        item = parts[0].strip()
        if not item or item == "*" or re.match(r"(?i)DISTINCT\b", item):
            pos = m.end()
            continue
        # an aggregate item is a real one-row aggregation (SELECT max(o.c));
        # drop only the wrapper level, keeping the scalar-subquery boundary,
        # so the guarded collapse pass (not this one) decides its fate
        repl = f"(SELECT {item})" if _item_has_own_agg(item) else f"({item})"
        if repl == out[outer_open:outer_end]:
            pos = outer_end
            continue
        out = out[:outer_open] + repl + out[outer_end:]
        # same position: the exposed item may itself start a foldable form


def _collect_correlated_subqueries(text: str, alias: str) -> list[str]:
    """Outermost balanced ``(SELECT ..)`` spans in *text* that reference
    ``alias.`` (i.e. correlate to the enclosing query's relation)."""
    spans: list[str] = []
    pos = 0
    while True:
        m = _PSELECT.search(text, pos)
        if not m:
            return spans
        end, _ = _scan_balanced(text, m.start())
        # EXISTS/IN/quantified predicates are not scalar subqueries —
        # Spark handles those positions natively (or other passes do)
        w = re.search(r"([A-Za-z_]\w*)\s*$", text[: m.start()])
        if w and w.group(1).upper() in ("EXISTS", "IN", "ANY", "ALL", "SOME"):
            pos = end
            continue
        span = text[m.start() : end]
        if re.search(rf"(?i)\b{re.escape(alias)}\s*\.", span):
            spans.append(span)
        pos = end


def _per_query_level(sql: str, fn) -> str:
    """Apply a per-SELECT rewrite at every query nesting level: recurse
    into each parenthesized SELECT body (innermost first), then apply
    *fn* to this level.  Lets top-level-anchored rewrites fire inside
    derived tables and subqueries too."""
    out = sql
    pos = 0
    while True:
        m = _PSELECT.search(out, pos)
        if not m:
            break
        end, _ = _scan_balanced(out, m.start())
        body = out[m.start() + 1 : end - 1]
        new_body = _per_query_level(body, fn)
        if new_body != body:
            out = out[: m.start() + 1] + new_body + out[end - 1 :]
            end = m.start() + 2 + len(new_body)
        pos = end
    return fn(out)


def _group_by_scalar_subquery_hoist(sql: str) -> str:
    """Correlated scalar subqueries as GROUP BY items, or in the select
    list of a grouped query (the reference decorrelates them via
    TransformCorrelatedScalarAggregationToJoin.java): Spark rejects a
    subquery as a grouping expression, and requires a select-list
    subquery to literally appear in GROUP BY.  Hoist: compute the
    subquery in a derived table projecting ``alias.*``, then group on the
    hoisted column (functionally dependent on the grouping keys, since
    Presto's analyzer only admits group-key correlations here).  Fires on
    the single-table ``FROM <rel> <alias> [WHERE ..] GROUP BY`` shape."""
    f0 = _depth0_find(sql, re.compile(r"(?i)\bFROM\b"))
    if f0 is None:
        return sql
    fm = re.match(
        r"(?i)FROM\s+([A-Za-z_]\w*)\s+(?:AS\s+)?([A-Za-z_]\w*)"
        r"\s+(WHERE\b|GROUP\s+BY\b)",
        sql[f0[0] :],
    )
    if not fm:
        return sql
    head = re.match(r"(?i)\s*SELECT\s+", sql)
    if not head or head.end() > f0[0]:
        return sql
    rel, alias = fm.group(1), fm.group(2)
    if alias.upper() in ("WHERE", "GROUP", "CROSS", "JOIN", "INNER", "LEFT",
                         "RIGHT", "FULL", "NATURAL", "UNION", "ORDER"):
        return sql
    # segment: select list / optional WHERE / GROUP BY items / tail
    sel = sql[head.end() : f0[0]]
    after = sql[f0[0] + fm.end(3) - len(fm.group(3)) :]
    where_txt = ""
    if fm.group(3).upper().startswith("WHERE"):
        gm = _depth0_find(after, re.compile(r"(?i)\bGROUP\s+BY\b"))
        if gm is None:
            return sql
        where_txt = after[5:gm[0]]  # text after WHERE keyword
        after = after[gm[0] :]
    gb_kw = re.match(r"(?i)GROUP\s+BY\b", after)
    if not gb_kw:
        return sql
    rest = after[gb_kw.end() :]
    tm = _depth0_find(
        rest, re.compile(r"(?i)\b(HAVING|ORDER|LIMIT|UNION|INTERSECT|EXCEPT)\b")
    )
    gb_items = rest[: tm[0]] if tm else rest
    tail = rest[tm[0] :] if tm else ""
    subs = _collect_correlated_subqueries(sel + " " + gb_items, alias)
    if not subs:
        return sql
    names: dict[str, str] = {}
    for s in subs:
        names.setdefault(s, f"__csq{len(names) + 1}")
    new_sel, new_gb, new_tail = sel, gb_items, tail
    for s, nm in names.items():
        new_sel = new_sel.replace(s, nm)
        new_gb = new_gb.replace(s, nm)
        new_tail = new_tail.replace(s, nm)
    # select-list subqueries not grouped yet join the grouping keys
    # (legal: Presto only admits group-key-correlated subqueries here)
    gb_list = [g.strip() for g in new_gb.split(",")]
    extra = [nm for nm in names.values() if nm not in gb_list]
    derived_cols = ", ".join(f"{s} AS {nm}" for s, nm in names.items())
    where_clause = f" WHERE {where_txt.strip()}" if where_txt.strip() else ""
    new_from = (
        f"FROM (SELECT {alias}.*, {derived_cols} FROM {rel} {alias}"
        f"{where_clause}) {alias} "
    )
    new_gb_full = ", ".join(gb_list + extra)
    return (
        sql[: head.end()] + new_sel + new_from
        + "GROUP BY " + new_gb_full + " " + new_tail
    ).rstrip() + ("" if not sql.endswith(" ") else " ")


def _depth0_find(text: str, pat: re.Pattern) -> tuple[int, str] | None:
    """(position, match text) of the first depth-0, non-quoted match."""
    depth = 0
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            j = text.find("'", i + 1)
            i = (j if j != -1 else n) + 1
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif depth == 0 and (ch.isalpha() or ch == "_") and (
            i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_")
        ):
            m = pat.match(text, i)
            if m:
                return i, m.group(0)
            w = _CLAUSE_WORD.match(text, i)
            i = w.end() if w else i + 1
            continue
        i += 1
    return None


_JOIN_ON_CLAUSE_END = re.compile(
    r"(?i)\b(WHERE|GROUP|HAVING|ORDER|LIMIT|UNION|INTERSECT|EXCEPT"
    r"|JOIN|INNER|LEFT|RIGHT|FULL|CROSS)\b"
)


def _join_on_subquery_compat(sql: str) -> str:
    """A scalar/EXISTS/IN subquery inside an INNER JOIN ON condition:
    Spark rejects correlated subqueries in join predicates referencing
    both inputs; the reference decorrelates them
    (PlanNodeDecorrelator.java) and falls back to nested-loop.  For an
    INNER join, ON <cond> ≡ CROSS JOIN + WHERE <cond>, and Spark's
    subquery decorrelation DOES work in filters — rewrite accordingly.
    Top-level INNER joins only; outer joins are left untouched (the
    equivalence doesn't hold)."""
    # a depth-0 set operation means several SELECT branches share this
    # level: the WHERE insertion below could land in the wrong branch —
    # leave such levels untouched (subquery levels still rewrite via
    # _per_query_level)
    if _depth0_find(sql, re.compile(r"(?i)\b(UNION|INTERSECT|EXCEPT)\b")):
        return sql
    # ON→WHERE is only sound when no LATER outer join can NULL-extend
    # the columns the hoisted predicate reads
    if _depth0_find(sql, re.compile(r"(?i)\b(RIGHT|FULL)\b")):
        return sql
    out = sql
    jm_pos = 0
    pending: list[str] = []
    while True:
        jm = _depth0_find(out[jm_pos:], re.compile(r"(?i)\bJOIN\b"))
        if jm is None:
            break
        j_at = jm_pos + jm[0]
        before = out[:j_at].rstrip()
        lead = re.search(r"(?i)\b(LEFT|RIGHT|FULL|CROSS|NATURAL|OUTER)\s*$", before)
        if lead:
            jm_pos = j_at + 4
            continue
        om = _depth0_find(out[j_at:], re.compile(r"(?i)\bON\b"))
        if om is None:
            jm_pos = j_at + 4
            continue
        on_at = j_at + om[0]
        cond_start = on_at + 2
        em = _depth0_find(out[cond_start:], _JOIN_ON_CLAUSE_END)
        cond_end = cond_start + em[0] if em else len(out)
        cond = out[cond_start:cond_end]
        if not re.search(r"(?i)\(\s*SELECT\b|\bEXISTS\s*\(", cond):
            jm_pos = cond_end
            continue
        # drop INNER if present, rewrite to CROSS JOIN, move cond to WHERE
        inner = re.search(r"(?i)\bINNER\s*$", out[:j_at].rstrip())
        cut = inner.start() if inner else j_at
        out = (
            out[:cut] + "CROSS JOIN" + out[j_at + 4 : on_at]
            + out[cond_end:]
        )
        pending.append(cond.strip())
        jm_pos = cut + 10
    if not pending:
        return sql
    conj = " AND ".join(f"({c})" for c in pending)
    wm = _depth0_find(out, re.compile(r"(?i)\bWHERE\b"))
    if wm is not None:
        at = wm[0] + 5
        return out[:at] + f" {conj} AND " + "(" + _insert_close(out, at)
    cm = _depth0_find(
        out, re.compile(r"(?i)\b(GROUP|HAVING|ORDER|LIMIT|UNION|INTERSECT|EXCEPT)\b")
    )
    at = cm[0] if cm else len(out)
    return out[:at].rstrip() + f" WHERE {conj} " + out[at:]


def _insert_close(out: str, at: int) -> str:
    """Close the parenthesis opened around an existing WHERE condition:
    the original predicate runs to the end of its clause."""
    em = _depth0_find(
        out[at:], re.compile(r"(?i)\b(GROUP|HAVING|ORDER|LIMIT|UNION|INTERSECT|EXCEPT)\b")
    )
    end = at + em[0] if em else len(out)
    return out[at:end].rstrip() + ") " + out[end:]


def _order_by_alias_subst(sql: str) -> str:
    """Presto resolves ORDER BY against BOTH output and input scopes; in
    a grouping-sets query Spark only sees the output columns, so ORDER
    BY -a fails when the projection is ``a AS foo``.  Substitute the
    alias for bare-identifier select items (value-identical by
    construction), unless the identifier is itself an output name."""
    # top-level SELECT list and last top-level ORDER BY
    head = re.match(r"(?i)\s*SELECT\s+", sql)
    if not head:
        return sql
    depth = 0
    from_at = ob = -1
    i, n = head.end(), len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = sql.find("'", i + 1)
            i = (j if j != -1 else n) + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and (ch.isalpha() or ch == "_") and not (
            sql[i - 1].isalnum() or sql[i - 1] == "_"
        ):
            m = _CLAUSE_WORD.match(sql, i)
            w = m.group(0).upper()
            if w == "FROM" and from_at < 0:
                from_at = i
            elif w == "ORDER" and re.match(r"(?i)ORDER\s+BY\b", sql[i:]):
                ob = i
            i = m.end()
            continue
        i += 1
    if from_at < 0 or ob < 0:
        return sql
    aliases: dict[str, str] = {}
    outputs: set[str] = set()
    sel_items, buf, d = [], [], 0
    for ch in sql[head.end() : from_at]:
        if ch == "," and d == 0:
            sel_items.append("".join(buf))
            buf = []
            continue
        if ch in "([":
            d += 1
        elif ch in ")]":
            d -= 1
        buf.append(ch)
    sel_items.append("".join(buf))
    for item in sel_items:
        am = re.fullmatch(
            r"\s*([A-Za-z_]\w*)\s+AS\s+([A-Za-z_]\w*)\s*", item, re.IGNORECASE
        )
        if am:
            aliases[am.group(1)] = am.group(2)
        # EVERY trailing alias is an output name (expr AS x shadows any
        # input column x in Presto's ORDER BY output scope)
        tm = re.search(r"(?i)\s+AS\s+([A-Za-z_]\w*)\s*$", item)
        if tm:
            outputs.add(tm.group(1))
        else:
            bm = re.fullmatch(r"\s*([A-Za-z_]\w*)\s*", item)
            if bm:
                outputs.add(bm.group(1))
    out_lower = {o.lower() for o in outputs}
    subst = {k: v for k, v in aliases.items() if k.lower() not in out_lower}
    tail = sql[ob:]
    if not subst or "'" in tail or re.search(
        r"(?i)\(\s*SELECT\b|\bgrouping(_id)?\s*\(", tail
    ):
        # quoted text / subqueries / grouping() (whose arguments must BE
        # the grouping columns): leave resolution alone
        return sql
    for k, v in subst.items():
        tail = re.sub(rf"(?i)(?<![\w.]){k}(?![\w.(])", v, tail)
    return sql[:ob] + tail


def _select_item_names(sel: str) -> list[str] | None:
    """Output names of a select list where every item is a bare column or
    aliased expression; None when any item is unnamed/wildcard."""
    items = _split_top_level(sel)
    names = []
    for part in items:
        am = re.search(r"(?i)\s+AS\s+([A-Za-z_]\w*)\s*$", part)
        if am:
            names.append(am.group(1))
        elif re.fullmatch(r"\s*[A-Za-z_][\w.]*\s*", part) and not \
                part.strip().endswith("*"):
            names.append(part.strip().split(".")[-1])
        else:
            return None
    return names


def _using_join_wildcard_compat(sql: str) -> str:
    """``SELECT a.*, b.* FROM (..) a JOIN (..) b USING (k)`` — ANSI (and
    the reference's StatementAnalyzer) EXCLUDE the using columns from a
    qualified wildcard; Spark keeps them.  When both relations are
    derived tables with statically known output names, expand the
    wildcards to the explicit non-using columns."""
    if not re.search(r"(?i)\bUSING\s*\(", sql):
        return sql
    fm = _depth0_find(sql, re.compile(r"(?i)\bFROM\b"))
    head = re.match(r"(?i)\s*SELECT\s+", sql)
    if fm is None or head is None or fm[0] < head.end():
        return sql
    sel = sql[head.end() : fm[0]]
    if not re.search(r"\b[A-Za-z_]\w*\s*\.\s*\*", sel):
        return sql
    # FROM ( .. ) a JOIN ( .. ) b USING (cols)
    m = re.match(r"(?i)FROM\s*\(", sql[fm[0] :])
    if not m:
        return sql
    o1 = fm[0] + m.end() - 1
    e1, _ = _scan_balanced(sql, o1)
    a1 = re.match(r"\s*(?:AS\s+)?([A-Za-z_]\w*)\s+JOIN\s*\(", sql[e1:],
                  re.IGNORECASE)
    if not a1:
        return sql
    o2 = e1 + a1.end() - 1
    e2, _ = _scan_balanced(sql, o2)
    a2 = re.match(r"\s*(?:AS\s+)?([A-Za-z_]\w*)\s+USING\s*\(", sql[e2:],
                  re.IGNORECASE)
    if not a2:
        return sql
    ou = e2 + a2.end() - 1
    eu, using_cols = _scan_balanced(sql, ou)
    using = {c.strip().lower() for c in using_cols}
    names = {}
    for alias, o, e in ((a1.group(1), o1, e1), (a2.group(1), o2, e2)):
        body = sql[o + 1 : e - 1]
        sm = re.match(r"(?i)\s*SELECT\s+", body)
        if not sm:
            return sql
        fm2 = _depth0_find(body, re.compile(r"(?i)\bFROM\b"))
        if fm2 is None:
            return sql
        cols = _select_item_names(body[sm.end() : fm2[0]])
        if cols is None:
            return sql
        names[alias.lower()] = cols

    def expand(wm: re.Match) -> str:
        al = wm.group(1)
        cols = names.get(al.lower())
        if cols is None:
            return wm.group(0)
        keep = [c for c in cols if c.lower() not in using]
        return ", ".join(f"{al}.{c}" for c in keep) if keep else wm.group(0)

    new_sel = re.sub(r"\b([A-Za-z_]\w*)\s*\.\s*\*", expand, sel)
    return sql[: head.end()] + new_sel + sql[fm[0] :]


def _order_by_mixed_scope_compat(sql: str) -> str:
    """A sort item mixing OUTPUT scope (bare ``a`` = the projected alias)
    and INPUT scope (``t.a`` = the relation column) in one expression —
    Presto resolves both (StatementAnalyzer ORDER BY scoping); Spark
    sees only one scope.  Rewrite: project the needed input columns
    alongside the output aliases in a derived table (``t.a`` →
    ``__sc_a``), leaving a single-scope ORDER BY the subquery/window
    hoist can then process.  Narrow shape: single aliased relation, all
    select items named, no grouping."""
    ob_m = _depth0_find(sql, re.compile(r"(?i)\bORDER\s+BY\b"))
    head = re.match(r"(?i)\s*SELECT\s+", sql)
    f0 = _depth0_find(sql, re.compile(r"(?i)\bFROM\b"))
    if ob_m is None or head is None or f0 is None or f0[0] < head.end():
        return sql
    middle = sql[f0[0] : ob_m[0]]
    if re.search(r"(?i)\b(GROUP|HAVING|DISTINCT|JOIN|UNION|LIMIT)\b", middle):
        return sql
    # FROM relation + alias: `name alias` or `( .. ) alias[(cols)]`
    rel_m = re.match(
        r"(?i)FROM\s+(?:([A-Za-z_]\w*)|(\())", sql[f0[0] :]
    )
    if not rel_m:
        return sql
    if rel_m.group(2):
        rend, _ = _scan_balanced(sql, f0[0] + rel_m.start(2))
        am = re.match(r"\s*(?:AS\s+)?([A-Za-z_]\w*)", sql[rend:], re.IGNORECASE)
    else:
        rend = f0[0] + rel_m.end(1)
        am = re.match(r"\s*(?:AS\s+)?([A-Za-z_]\w*)", sql[rend:], re.IGNORECASE)
    if not am or am.group(1).upper() in ("WHERE", "ORDER"):
        return sql
    alias = am.group(1)
    # select list: every item must be named
    sel = sql[head.end() : f0[0]]
    items = _split_top_level(sel)
    names = []
    for part in items:
        am2 = re.search(r"(?i)\s+AS\s+([A-Za-z_]\w*)\s*$", part)
        if am2:
            names.append((am2.group(1), part[: am2.start()].strip()))
        elif re.fullmatch(r"\s*[A-Za-z_][\w.]*\s*", part):
            names.append((part.strip().split(".")[-1], part.strip()))
        else:
            return sql
    out_names = {n.lower() for n, _ in names}
    # qualified input refs in the ORDER BY tail whose bare name is a
    # SHADOWED output alias (projected expression differs from the col)
    tail = sql[ob_m[0] :]
    needed = []
    qualified_all = []
    for qm in re.finditer(
        rf"(?i)\b{re.escape(alias)}\s*\.\s*([A-Za-z_]\w*)", tail
    ):
        col = qm.group(1)
        if col.lower() not in [c.lower() for c in qualified_all]:
            qualified_all.append(col)
        if col.lower() in out_names and not any(
            n.lower() == col.lower()
            and e.lower() in (col.lower(), f"{alias}.{col}".lower())
            for n, e in names
        ):
            if col.lower() not in [c.lower() for c in needed]:
                needed.append(col)
    if not needed:
        return sql
    # the derived table removes `alias` from scope for the whole tail —
    # EVERY qualified ref must become a projected __sc_ column, not just
    # the shadowed ones, or `t.b` in another sort item fails analysis
    for col in qualified_all:
        if col.lower() not in [c.lower() for c in needed]:
            needed.append(col)
    inner_extra = ", ".join(
        f"{alias}.{col} AS __sc_{col.lower()}" for col in needed
    )
    inner = f"SELECT {sel.strip()}, {inner_extra} {sql[f0[0]:ob_m[0]].strip()}"
    new_tail = tail
    for col in needed:
        new_tail = re.sub(
            rf"(?i)\b{re.escape(alias)}\s*\.\s*{re.escape(col)}\b",
            f"__sc_{col.lower()}",
            new_tail,
        )
    out_list = ", ".join(n for n, _ in names)
    return f"SELECT {out_list} FROM ({inner}) __sc {new_tail}"


def _order_by_subquery_hoist(sql: str) -> str:
    """ORDER BY items holding EXISTS/scalar subqueries — Presto sorts on
    them directly; Spark's grammar/analyzer rejects subqueries in sort
    items.  Hoist each subquery item into a projected __ordN column of a
    derived table and sort on that.  Applies to the simple shape the
    reference uses: a bare-identifier select list, no GROUP BY/DISTINCT,
    top-level ORDER BY."""
    # the LAST depth-0 ORDER BY of the statement
    depth = 0
    ob = -1
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = sql.find("'", i + 1)
            i = (j if j != -1 else n) + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and ch in "Oo":
            m = re.match(r"(?i)ORDER\s+BY\b", sql[i:])
            if m and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")):
                ob = i
                i += m.end()
                continue
        i += 1
    if ob < 0:
        return sql
    tail_m = re.search(r"(?i)\b(LIMIT|OFFSET|FETCH)\b", sql[ob:])
    items_end = ob + tail_m.start() if tail_m else n
    items_text = sql[ob:items_end]
    items_text = re.sub(r"(?i)^ORDER\s+BY", "", items_text)
    items = []
    buf, depth = [], 0
    for ch in items_text:
        if ch == "," and depth == 0:
            items.append("".join(buf))
            buf = []
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        buf.append(ch)
    items.append("".join(buf))
    if not any(
        re.search(r"(?i)EXISTS\s*\(|\(\s*SELECT\b|\bOVER\s*\(|\bgrouping\s*\(", it)
        for it in items
    ):
        return sql
    head_m = re.match(r"(?i)\s*SELECT\s+", sql)
    if not head_m:
        return sql
    from_m = None
    depth = 0
    for k in range(head_m.end(), ob):
        ch = sql[k]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and ch in "Ff":
            fm = re.match(r"(?i)FROM\b", sql[k:])
            if fm and not (sql[k - 1].isalnum() or sql[k - 1] == "_"):
                from_m = k
                break
    if from_m is None:
        return sql
    sel = sql[head_m.end() : from_m].strip()
    star = sel == "*"
    bare = bool(
        re.fullmatch(
            r"[A-Za-z_][\w.]*(\s+AS\s+[A-Za-z_]\w*)?"
            r"(\s*,\s*[A-Za-z_][\w.]*(\s+AS\s+[A-Za-z_]\w*)?)*",
            sel,
            re.IGNORECASE,
        )
    )
    middle = sql[from_m:ob]
    if re.search(r"(?i)\bDISTINCT\b", middle):
        return sql
    # a grouped query can still hoist ORDER BY grouping(..) items — they
    # are legal in the grouped projection; anything else (subquery/OVER)
    # would reference input scope and must not be hoisted past GROUP BY
    grouped = bool(re.search(r"(?i)\b(GROUP\s+BY|HAVING)\b", middle))
    names = []
    mixed = False  # an unnamed expression item (incl. a *) in the list
    if not star:
        sel_parts, buf, d = [], [], 0
        for ch in sel:
            if ch == "," and d == 0:
                sel_parts.append("".join(buf))
                buf = []
                continue
            if ch in "([":
                d += 1
            elif ch in ")]":
                d -= 1
            buf.append(ch)
        sel_parts.append("".join(buf))
        for part in sel_parts:
            am = re.search(r"(?i)\s+AS\s+([A-Za-z_]\w*)\s*$", part)
            if am:
                names.append(am.group(1))
            elif re.fullmatch(r"\s*[A-Za-z_][\w.]*\s*", part) and not \
                    part.strip().endswith("*"):
                names.append(part.strip().split(".")[-1])
            else:
                # unnamed expression item — re-projection by name is
                # impossible; the * EXCEPT nesting below still works
                mixed = True
                break
    hoisted, new_items = [], []
    for it in items:
        core = it.strip()
        sm = re.match(
            r"(?i)^(.*?)\s*(ASC|DESC)?\s*(NULLS\s+(?:FIRST|LAST))?\s*$",
            core,
            re.DOTALL,
        )
        expr, suffix = sm.group(1), core[len(sm.group(1)) :]
        trigger = re.search(r"(?i)EXISTS\s*\(|\(\s*SELECT\b|\bOVER\s*\(", expr)
        grouping_item = grouped and re.fullmatch(
            r"(?i)\s*grouping\s*\([\w\s,.]*\)\s*", expr
        )
        if grouped and trigger:
            return sql  # input-scope expression can't cross GROUP BY
        if trigger or grouping_item:
            alias = f"__ord{len(hoisted) + 1}"
            hoisted.append(f"{expr} AS {alias}")
            new_items.append(alias + suffix)
        else:
            new_items.append(core)
    if not hoisted:
        return sql
    if mixed and not grouped:
        # the outer * EXCEPT projection only exposes the inner select
        # items — plain sort items (input-scope columns/expressions)
        # must be hoisted alongside or they no longer resolve outside
        fixed = []
        for it in new_items:
            core = it.strip()
            if re.match(r"__ord\d+\b", core):
                fixed.append(core)
                continue
            sm2 = re.match(
                r"(?i)^(.*?)\s*(ASC|DESC)?\s*(NULLS\s+(?:FIRST|LAST))?\s*$",
                core,
                re.DOTALL,
            )
            expr2, suffix2 = sm2.group(1), core[len(sm2.group(1)) :]
            alias2 = f"__ord{len(hoisted) + 1}"
            hoisted.append(f"{expr2} AS {alias2}")
            fixed.append(alias2 + suffix2)
        new_items = fixed
    if star or mixed or grouped:
        # SELECT * (or a list with unnamed expression items, or a grouped
        # query whose hoisted items live in the grouped projection) —
        # hoist alongside, drop the helper columns outside;
        # auto-generated names for unnamed items survive the nesting
        base = "*" if star else sel
        inner = f"SELECT {base}, {', '.join(hoisted)} {middle}"
        drops = ", ".join(
            f"__ord{k + 1}" for k in range(len(hoisted))
        )
        return (
            f"SELECT * EXCEPT ({drops}) FROM ({inner.rstrip()}) __hoist "
            f"ORDER BY {', '.join(new_items)} {sql[items_end:]}"
        )
    if bare:
        # input scope == output scope for bare-identifier projections:
        # compute the sort expressions alongside the projection
        inner = f"SELECT {sel}, {', '.join(hoisted)} {middle}"
        return (
            f"SELECT {', '.join(names)} FROM ({inner.rstrip()}) __hoist "
            f"ORDER BY {', '.join(new_items)} {sql[items_end:]}"
        )
    # aliased-expression projection: Presto resolves the sort items in
    # the OUTPUT scope (a AS alias shadows input a) — two layers, so
    # the hoisted expressions see the projected values
    inner1 = f"SELECT {sel} {middle}".rstrip()
    inner2 = (
        f"SELECT {', '.join(names)}, {', '.join(hoisted)} "
        f"FROM ({inner1}) __h1"
    )
    return (
        f"SELECT {', '.join(names)} FROM ({inner2}) __hoist "
        f"ORDER BY {', '.join(new_items)} {sql[items_end:]}"
    )


def _cast_target(content: str) -> str | None:
    c = content.strip()
    if re.search(r"(?i)\bAS\s+REAL\s*$", c):
        return "real"
    if re.search(r"(?i)\bAS\s+DECIMAL\s*\([^()]*\)\s*$", c):
        return "dec"
    return None


def _real_decimal_cmp_compat(sql: str) -> str:
    """REAL ⋈ DECIMAL comparisons coerce the decimal to REAL in Presto
    (TypeRegistry real/decimal coercion); Spark widens both to DOUBLE,
    where float literals like 1.2f no longer equal their decimal
    spelling.  Cast the decimal side down to REAL for the static
    CAST-vs-CAST shape (balanced-paren scan, so CASE operands work)."""
    out = sql
    pos = 0
    while True:
        m = re.search(r"(?i)\bCAST\s*\(", out[pos:])
        if not m:
            return out
        start = pos + m.start()
        open_idx = out.index("(", start + 4)
        end, _ = _scan_balanced(out, open_idx)
        side = _cast_target(out[open_idx + 1 : end - 1])
        m2 = re.match(
            r"\s*(=|<>|!=|<=|>=|<|>)\s*CAST\s*\(", out[end:], re.IGNORECASE
        )
        if side is None or not m2:
            pos = open_idx + 1
            continue
        open2 = out.index("(", end + m2.end() - 1)
        end2, _ = _scan_balanced(out, open2)
        other = _cast_target(out[open2 + 1 : end2 - 1])
        if other is None or {side, other} != {"real", "dec"}:
            pos = open_idx + 1
            continue
        if side == "dec":
            out = (
                out[:start] + "CAST(" + out[start:end] + " AS REAL)"
                + out[end:]
            )
        else:
            rstart = end + re.search(
                r"(?i)CAST\s*\($", out[end : open2 + 1]
            ).start()
            out = (
                out[:rstart] + "CAST(" + out[rstart:end2] + " AS REAL)"
                + out[end2:]
            )
        pos = end2 + len("CAST( AS REAL)")


def _values_lambda_compat(sql: str) -> str:
    """``(VALUES transform(seq, x -> ..))`` — Spark inline tables demand
    foldable expressions and reject lambdas; rewrite the VALUES rows as
    a UNION ALL of SELECTs (exactly Presto's semantics for computed
    rows)."""
    out = sql
    pos = 0
    while True:
        m = re.search(r"\(\s*VALUES\b", out[pos:], re.IGNORECASE)
        if not m:
            return out
        start = pos + m.start()
        end, _ = _scan_balanced(out, start)
        body = out[start + 1 : end - 1]
        body = body[re.match(r"\s*VALUES", body, re.IGNORECASE).end() :]
        if "->" not in body:
            pos = end
            continue
        rows, buf, d = [], [], 0
        for ch in body:
            if ch == "," and d == 0:
                rows.append("".join(buf))
                buf = []
                continue
            if ch in "([":
                d += 1
            elif ch in ")]":
                d -= 1
            buf.append(ch)
        rows.append("".join(buf))
        selects = []
        for r in rows:
            r = r.strip()
            if r.startswith("(") and r.endswith(")"):
                e, _args = _scan_balanced(r, 0)
                if e == len(r):
                    r = r[1:-1]
            selects.append(f"SELECT {r}")
        repl = "(" + " UNION ALL ".join(selects) + ")"
        out = out[:start] + repl + out[end:]
        pos = start + len(repl)


_IN_SUBQ = re.compile(r"\b(NOT\s+)?IN\s*\(\s*\(?\s*SELECT\b", re.IGNORECASE)

_CLAUSE_WORD = re.compile(r"[A-Za-z_][A-Za-z_0-9]*")


def _clause_at(sql: str, pos: int) -> str | None:
    """The SQL clause ('select' = projection list, 'from', 'where', …)
    the position belongs to, via a depth-stacked keyword scan."""
    stack: list[str | None] = [None]
    i = 0
    while i < pos:
        ch = sql[i]
        if ch == "'":
            j = sql.find("'", i + 1)
            i = (j if j != -1 else len(sql)) + 1
            continue
        if ch == "(":
            stack.append(None)
            i += 1
            continue
        if ch == ")":
            if len(stack) > 1:
                stack.pop()
            i += 1
            continue
        if ch.isalpha() or ch == "_":
            m = _CLAUSE_WORD.match(sql, i)
            w = m.group(0).upper()
            if w == "SELECT":
                stack[-1] = "select"
            elif w in ("FROM", "WHERE", "GROUP", "HAVING", "ORDER",
                       "LIMIT", "WINDOW"):
                stack[-1] = w.lower()
            i = m.end()
            continue
        i += 1
    return stack[-1]


def _in_subquery_3vl_compat(sql: str) -> str:
    """``x [NOT] IN (subquery)`` in a PROJECTION renders Spark's
    existence join, which yields FALSE where ANSI three-valued logic
    gives NULL (x IS NULL with a non-empty subquery, or no match with
    NULLs present in the subquery; reference semantics
    presto-main InPredicate evaluation / H2 differential
    testSemiJoinNullHandling).  Rewrites the projection occurrence into
    Spark's IN (correct for the definitive TRUE) plus one scalar
    aggregate subquery supplying (count(*), count(col)) for the NULL
    disambiguation — same shape as the quantified-comparison lowering.
    WHERE/HAVING/ON positions are left to Spark's native semi/anti
    joins, which are both correct there and join-optimal."""
    out = sql
    pos = 0
    while True:
        m = _IN_SUBQ.search(out, pos)
        if not m:
            return out
        if _clause_at(out, m.start()) != "select":
            pos = m.end()
            continue
        open_idx = out.index("(", m.start() + (len(m.group(1) or "") + 2))
        end, _ = _scan_balanced(out, open_idx)
        sub = out[open_idx + 1 : end - 1].strip()
        start = _left_operand_start(out, m.start())
        x = out[start : m.start()].strip()
        # bail on tuple operands (the single-column alias can't bind)
        if not x or (x.startswith("(") and "," in x):
            pos = m.end()
            continue
        # a GROUP BY / HAVING twin of the same expression must stay
        # textually identical to the projection for Spark to match them
        norm = " ".join(out[start:end].split())
        if " ".join(out.split()).count(norm) > 1:
            pos = m.end()
            continue
        s = (
            "(SELECT named_struct('n', count(*), 'nn', count(__qc)) "
            f"FROM ({sub}) AS __qa(__qc))"
        )
        core = (
            f"(CASE WHEN ({x}) IN ({sub}) THEN TRUE "
            f"WHEN {s}.n = 0 THEN FALSE "
            f"WHEN ({x}) IS NULL THEN {_NULL_BOOL} "
            f"WHEN {s}.n > {s}.nn THEN {_NULL_BOOL} ELSE FALSE END)"
        )
        repl = f"(NOT {core})" if m.group(1) else core
        out = out[:start] + repl + out[end:]
        pos = start + len(repl)


_HAS_GROUPING_SETS = re.compile(
    r"\bGROUPING\s+SETS\b|\bCUBE\s*\(|\bROLLUP\s*\(", re.IGNORECASE
)


_AGG_CALL = re.compile(
    r"(?i)\b(count|sum|avg|min|max|array_agg|bool_and|bool_or|every"
    r"|arbitrary|any_value|stddev\w*|var\w*|corr|covar\w*|checksum"
    r"|approx_\w+|geometric_mean|kurtosis|skewness)\s*\("
)


_CONST_ITEM_KEYWORDS = {
    "TRUE", "FALSE", "NULL", "AS", "CAST", "TRY_CAST", "INTERVAL", "DATE",
    "TIMESTAMP", "DOUBLE", "REAL", "FLOAT", "BIGINT", "INTEGER", "INT",
    "SMALLINT", "TINYINT", "VARCHAR", "CHAR", "DECIMAL", "BOOLEAN", "STRING",
}


def _const_select_item(item: str) -> bool:
    """True when the select item is a constant expression — only literal
    placeholders, numbers, quoted strings, and literal/type keywords; no
    column references."""
    core = re.sub(r"(?is)\s+AS\s+[A-Za-z_]\w*\s*$", "", item.strip())
    # a BARE identifier is a column reference even when it spells a type
    # keyword (`SELECT date FROM t` — 'date' is a column, not a literal);
    # only the literal keywords are constants on their own
    if re.fullmatch(r"[A-Za-z_]\w*", core.strip()):
        return core.strip().upper() in ("TRUE", "FALSE", "NULL")
    scrubbed = re.sub(r"\x00\d+\x00|'(?:[^']|'')*'", " ", core)
    toks = re.findall(r"[A-Za-z_]\w*", scrubbed)
    return all(t.upper() in _CONST_ITEM_KEYWORDS for t in toks)


def _empty_grouping_sets_compat(sql: str) -> str:
    """Spark's expand-based grouping sets emit ZERO rows over empty
    input; Presto emits one row per empty () grouping set (grand
    total) — AbstractTestQueries testGroupingSets*NoInput /
    testCubeNoInput.  Decompose statically: the () sets split off as
    UNION ALL'd global aggregations (a Spark global aggregate always
    emits its row), the remaining sets keep the GROUPING SETS plan.
    Equivalent on any input, applied only to the trailing-GROUP BY shape
    without grouping()/HAVING/ORDER."""
    m = re.search(
        r"(?i)\bGROUP\s+BY\s+(GROUPING\s+SETS|CUBE|ROLLUP)\s*\(", sql
    )
    if not m or re.search(r"(?i)\bgrouping\s*\(|\bHAVING\b|\bDISTINCT\b", sql):
        return sql
    kind = m.group(1).upper()
    open_idx = sql.index("(", m.end() - 1)
    end, sets_raw = _scan_balanced(sql, open_idx)
    if sql[end:].strip():
        return sql  # only the trailing-clause shape
    if kind.startswith("GROUPING"):
        sets = [s.strip() for s in sets_raw]
    else:
        cols = [c.strip() for c in sets_raw]
        if kind == "CUBE":
            from itertools import combinations

            sets = [
                "(" + ", ".join(c) + ")"
                for r in range(len(cols), -1, -1)
                for c in combinations(cols, r)
            ]
        else:  # ROLLUP
            sets = [
                "(" + ", ".join(cols[:r]) + ")"
                for r in range(len(cols), -1, -1)
            ]
    empties = [s for s in sets if re.fullmatch(r"\(\s*\)", s)]
    nonempty = [s for s in sets if not re.fullmatch(r"\(\s*\)", s)]
    if not empties:
        return sql
    head_m = re.match(r"(?i)\s*SELECT\s+", sql)
    if not head_m:
        return sql
    gb = m.start()
    depth = 0
    from_at = None
    for k in range(head_m.end(), gb):
        ch = sql[k]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and ch in "Ff" and re.match(r"(?i)FROM\b", sql[k:]) \
                and not (sql[k - 1].isalnum() or sql[k - 1] == "_"):
            from_at = k
            break
    if from_at is None:
        return sql
    sel = sql[head_m.end() : from_at].strip()
    items = []
    buf, depth = [], 0
    for ch in sel:
        if ch == "," and depth == 0:
            items.append("".join(buf))
            buf = []
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        buf.append(ch)
    items.append("".join(buf))
    # grand-total branch: grouping columns render NULL; aggregates and
    # constant items (literals/masked placeholders — `SELECT 1, count(*)`)
    # keep their value, exactly as Presto's grand-total row does
    def _global_item(it: str) -> str:
        s = it.strip()
        if _AGG_CALL.search(s) or _const_select_item(s):
            return s
        am = re.search(r"(?is)\s+AS\s+([A-Za-z_]\w*)\s*$", s)
        return f"NULL AS {am.group(1)}" if am else "NULL"

    global_sel = ", ".join(_global_item(it) for it in items)
    middle = sql[from_at:gb].rstrip()
    global_q = f"SELECT {global_sel} {middle}"
    parts = []
    if nonempty:
        parts.append(
            f"SELECT {sel} {middle} GROUP BY GROUPING SETS "
            f"({', '.join(nonempty)})"
        )
    parts.extend([global_q] * len(empties))
    return " UNION ALL ".join(parts)


def _depth0_search(text: str, pat: re.Pattern) -> bool:
    depth = 0
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            j = text.find("'", i + 1)
            i = (j if j != -1 else n) + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and (ch.isalpha() or ch == "_"):
            m = pat.match(text, i)
            if m and (i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_")):
                return True
            w = _CLAUSE_WORD.match(text, i)
            i = w.end() if w else i + 1
            continue
        i += 1
    return False


_GS_KW = re.compile(r"(?i)GROUPING\s+SETS|CUBE\s*\(|ROLLUP\s*\(")
_SELECT_KW = re.compile(r"(?i)SELECT\b")


def _grouping_plain_scope_fold(sql: str) -> str:
    """grouping(..) whose OWN query block uses a plain GROUP BY folds to
    constant 0 (GroupingOperationRewriter) — scope-aware, so a grouping
    sets clause in an OUTER or INNER block doesn't leak in
    (AbstractTestQueries testGroupingInTableSubquery: alternating GROUP
    BY and GROUPING SETS in one plan)."""
    out = sql
    pos = 0
    while True:
        m = re.search(r"(?i)\bgrouping\s*\(", out[pos:])
        if not m:
            return out
        start = pos + m.start()
        open_idx = out.index("(", start + 8)
        end, _ = _scan_balanced(out, open_idx)
        # innermost→outermost enclosing paren spans containing the call
        spans = []
        stack = []
        i, n = 0, len(out)
        while i < n:
            ch = out[i]
            if ch == "'":
                j = out.find("'", i + 1)
                i = (j if j != -1 else n) + 1
                continue
            if ch == "(":
                stack.append(i)
            elif ch == ")":
                if stack:
                    s = stack.pop()
                    if s < start and i >= end:
                        spans.append((s + 1, i))
            i += 1
        spans.sort(key=lambda se: se[1] - se[0])
        spans.append((0, n))
        block = None
        for s, e in spans:
            if _depth0_search(out[s:e], _SELECT_KW):
                block = (s, e)
                break
        if block and not _depth0_search(out[block[0] : block[1]], _GS_KW):
            out = out[:start] + "0" + out[end:]
            pos = start + 1
        else:
            pos = end


def _grouping_compat(sql: str) -> str:
    """grouping(a, b, ...) (GroupingOperationRewriter.java) — Presto
    allows multiple arguments (a bitmap, leftmost = most significant,
    same layout as Spark's grouping_id) and allows grouping() over a
    plain GROUP BY, where every column is grouped so the result is
    constant 0.  Spark's grouping() is single-argument and analysis
    rejects it outside grouping-sets queries."""
    has_gs = bool(_HAS_GROUPING_SETS.search(sql))

    def fn(args: list[str]) -> str | None:
        if not args or (len(args) == 1 and not args[0].strip()):
            return None
        if not has_gs:
            return "0"
        if len(args) > 1:
            # bit-sum of single-column grouping() calls: leftmost arg is
            # the most significant bit, same layout as the reference's
            # rewriter — and unlike Spark's grouping_id it accepts any
            # subset/order of the grouping columns
            n = len(args)
            terms = [
                f"grouping({a}) * {1 << (n - 1 - i)}" if n - 1 - i else f"grouping({a})"
                for i, a in enumerate(args)
            ]
            return f"({' + '.join(terms)})"
        return None

    return _rewrite_calls(sql, "grouping", fn)


_GB_DISTINCT = re.compile(
    r"\bGROUP\s+BY\s+DISTINCT\s+(GROUPING\s+SETS\s*)?", re.IGNORECASE
)


def _grouping_product_distinct(body: str) -> str:
    """Expand a composite GROUP BY item list (plain exprs mixed with
    ROLLUP/CUBE/GROUPING SETS) into its cross product of grouping sets,
    dedupe as column sets, and render a GROUPING SETS list."""
    from itertools import combinations, product

    items = _split_top_level(body)

    def factors(item: str) -> list[list[str]]:
        im = re.match(r"(?i)\s*(ROLLUP|CUBE|GROUPING\s+SETS)\s*\(", item)
        if not im:
            return [[item.strip()]]
        _end, args = _scan_balanced(item, item.index("(", im.end() - 1))
        kind = im.group(1).upper()
        cols = [a.strip() for a in args]
        if kind == "ROLLUP":
            return [cols[:r] for r in range(len(cols), -1, -1)]
        if kind == "CUBE":
            return [
                list(c)
                for r in range(len(cols), -1, -1)
                for c in combinations(cols, r)
            ]
        sets: list[list[str]] = []
        for a in cols:
            if a.startswith("("):
                _e, inner = _scan_balanced(a, 0)
                sets.append([x.strip() for x in inner if x.strip()])
            elif a:
                sets.append([a])
            else:
                sets.append([])
        return sets

    seen: set[frozenset[str]] = set()
    rendered: list[str] = []
    for combo in product(*(factors(it) for it in items)):
        cols: list[str] = []
        for part in combo:
            for c in part:
                if c not in cols:
                    cols.append(c)
        key = frozenset(" ".join(c.split()) for c in cols)
        if key in seen:
            continue
        seen.add(key)
        rendered.append("(" + ", ".join(cols) + ")")
    return ", ".join(rendered)


def _group_by_distinct_compat(sql: str) -> str:
    """GROUP BY DISTINCT [GROUPING SETS (...)] — the reference dedupes
    grouping sets before expansion (SqlBase.g4 setQuantifier on
    groupBy); Spark has no DISTINCT there.  Dedupe the set list
    statically (whitespace-normalized) and drop the keyword."""
    out = sql
    while True:
        m = _GB_DISTINCT.search(out)
        if not m:
            return out
        if not m.group(1):
            # GROUP BY DISTINCT a, b[, ROLLUP(..), CUBE(..), ...] — the
            # reference computes the CROSS PRODUCT of the composite
            # grouping elements, then dedupes the resulting sets
            # (StatementAnalyzer analyzeGroupBy + setQuantifier).  With
            # ROLLUP/CUBE present the product must be expanded statically
            # to deduped GROUPING SETS; plain keys just drop DISTINCT.
            endm = _depth0_find(
                out[m.end() :],
                re.compile(r"(?i)\b(HAVING|ORDER|LIMIT|UNION|INTERSECT"
                           r"|EXCEPT|WINDOW|OFFSET|FETCH)\b"),
            )
            body_end = m.end() + (endm[0] if endm else len(out) - m.end())
            body = out[m.end() : body_end]
            if not re.search(r"(?i)\b(ROLLUP|CUBE|GROUPING\s+SETS)\s*\(", body):
                out = out[: m.start()] + "GROUP BY " + out[m.end() :]
                continue
            sets_sql = _grouping_product_distinct(body)
            out = (
                out[: m.start()]
                + f"GROUP BY GROUPING SETS ({sets_sql}) "
                + out[body_end:]
            )
            continue
        open_idx = out.index("(", m.end() - 1)
        end, sets = _scan_balanced(out, open_idx)
        seen, deduped = set(), []
        for s_item in sets:
            key = " ".join(s_item.split())
            if key not in seen:
                seen.add(key)
                deduped.append(s_item if s_item.strip() else "()")
        body = ", ".join(
            d if d.lstrip().startswith("(") or d == "()" else f"({d})"
            for d in deduped
        )
        out = (
            out[: m.start()]
            + f"GROUP BY GROUPING SETS ({body})"
            + out[end:]
        )


def _entries_sql(k: str, v: str) -> str:
    return (
        f"collect_list(CASE WHEN {k} IS NOT NULL THEN "
        f"struct({k} AS k, {v} AS v) END)"
    )


def _map_agg_sql(args: list[str]) -> str | None:
    """map_agg(k, v) in the SQL path (MapAggregationFunction.java):
    dedupe BY KEY — first value wins, NULL keys skipped, matching the
    DataFrame-tier builder (functions/aggregates_reg.py map_agg).  A
    fold (aggregate HOF) dedupes so the collect_list never appears
    inside a lambda body (SQL lambda binding would capture its column
    references); the zero map derives its type from the entries
    themselves via an empty slice."""
    if len(args) != 2:
        return None
    e = _entries_sql(args[0], args[1])
    zero = f"map_from_entries(slice({e}, 1, 0))"
    return (
        f"aggregate({e}, {zero}, (__acc, __e) -> "
        f"CASE WHEN map_contains_key(__acc, __e.k) THEN __acc "
        f"ELSE map_concat(__acc, map(__e.k, __e.v)) END)"
    )


def _multimap_agg_sql(args: list[str]) -> str | None:
    """multimap_agg(k, v) → map<k, array<v>> (MultimapAggregationFunction;
    NULL keys skipped like map_agg)."""
    if len(args) != 2:
        return None
    e = _entries_sql(args[0], args[1])
    zero = (
        f"map_from_entries(slice(transform({e}, "
        f"__t -> struct(__t.k AS k, array(__t.v) AS v)), 1, 0))"
    )
    return (
        f"aggregate({e}, {zero}, (__acc, __e) -> "
        f"CASE WHEN map_contains_key(__acc, __e.k) THEN "
        f"map_concat(map_filter(__acc, (__kk, __vv) -> NOT (__kk <=> __e.k)), "
        f"map(__e.k, array_append(element_at(__acc, __e.k), __e.v))) "
        f"ELSE map_concat(__acc, map(__e.k, array(__e.v))) END)"
    )


def _minmax_by_n(desc: bool):
    """min_by/max_by(x, y, n) → top-n x by y (minmaxby/ package;
    MaxByNAggregationFunction).  NULL keys skipped like the reference's
    TypedKeyValueHeap."""
    first, second = ("-1", "1") if desc else ("1", "-1")

    def fn(args: list[str]) -> str | None:
        if len(args) != 3:
            return None
        x, y, n = args
        return (
            f"slice(transform(array_sort("
            f"collect_list(CASE WHEN {y} IS NOT NULL THEN "
            f"struct({y} AS k, {x} AS v) END), "
            f"(__a, __b) -> CASE WHEN __a.k > __b.k THEN {first} "
            f"WHEN __a.k < __b.k THEN {second} ELSE 0 END), "
            f"__s -> __s.v), 1, {n})"
        )

    return fn


_AGG_ORDER_BY = re.compile(
    r"^(.*?)\s+ORDER\s+BY\s+(.+?)(?:\s+(ASC|DESC))?\s*$",
    re.IGNORECASE | re.DOTALL,
)


_ARRAY_AGG_CALL = re.compile(r"\barray_agg\s*\(", re.IGNORECASE)
_FILTER_TAIL = re.compile(r"\s*FILTER\s*\(\s*WHERE\s+", re.IGNORECASE)


def _array_agg_body(arg: str, pred: str | None) -> str | None:
    m = _AGG_ORDER_BY.match(arg)
    if m:
        e, k, direction = m.group(1), m.group(2), (m.group(3) or "ASC").upper()
        first, second = ("1", "-1") if direction == "ASC" else ("-1", "1")
        entry = f"struct({k} AS k, {e} AS v)"
        if pred:
            entry = f"CASE WHEN ({pred}) THEN {entry} END"
        lst = (
            f"array_sort(collect_list({entry}), "
            f"(__a, __b) -> CASE WHEN __a.k > __b.k THEN {first} "
            f"WHEN __a.k < __b.k THEN {second} ELSE 0 END)"
        )
    else:
        entry = f"struct({arg} AS v)"
        if pred:
            entry = f"CASE WHEN ({pred}) THEN {entry} END"
        lst = f"collect_list({entry})"
    return (
        f"(CASE WHEN size({lst}) = 0 THEN NULL "
        f"ELSE transform({lst}, __s -> __s.v) END)"
    )


def _array_agg_compat(sql: str) -> str:
    """array_agg(e [ORDER BY k [ASC|DESC]]) [FILTER (WHERE p)] in the
    SQL path (arrayagg/ArrayAggregationFunction + AggregationNode
    orderings + ImplementFilteredAggregations): keeps NULL values
    (collect_list drops bare NULLs, so elements ride in structs),
    returns NULL — not [] — for an empty group, and folds a FILTER
    clause into the collected entry (equivalent, since NULL entries are
    dropped)."""
    out = sql
    pos = 0
    while True:
        m = _ARRAY_AGG_CALL.search(out, pos)
        if not m:
            return out
        end, args = _scan_balanced(out, m.end() - 1)
        if len(args) != 1 or args[0].strip().upper().startswith("DISTINCT"):
            pos = m.end()
            continue
        pred = None
        tail_end = end
        fm = _FILTER_TAIL.match(out, end)
        if fm:
            open_idx = out.index("(", end, fm.end())
            fend, _ = _scan_balanced(out, open_idx)
            pred = out[fm.end() : fend - 1].strip()
            tail_end = fend
        body = _array_agg_body(args[0], pred)
        out = out[: m.start()] + body + out[tail_end:]
        pos = m.start() + len(body)


# DECIMAL 'x.yz' typed literal (presto-parser grammar) — Spark has no
# DECIMAL literal keyword; lower to CAST with the literal's own
# precision/scale, exactly how the reference types it.
# --- Presto arithmetic posture (MathFunctions.java, *Operators.java) --------
# Presto: integer `/` is Java truncating integer division; floating
# division by literal zero yields ±Infinity / NaN (IEEE754).  Spark-ANSI
# divides int/int in double and raises DIVIDE_BY_ZERO.  Two statically
# decidable dialect rewrites recover Presto semantics without abandoning
# the engine's ANSI default: int-literal/int-literal → DIV, and
# X / <zero float literal> → CAST(X AS DOUBLE) * Infinity (x>0 → Inf,
# x<0 → -Inf, x=0 or NaN → NaN, NULL → NULL — exactly IEEE x/0.0).
_INT_DIV = re.compile(r"(?<![\w.\x00])(\d+)\s*/\s*(\d+)(?![\w.\x00])")
# operands that are STATICALLY integral: plain integer literal, typed
# integer literal, or a CAST whose target is an integral type
_STATIC_INTEGRAL_OPERAND = re.compile(
    r"^\s*(?:[-+]?\d+"
    r"|(?:BIGINT|INTEGER|INT|SMALLINT|TINYINT)\s*\x00\d+\x00"
    r"|(?:TRY_)?CAST\s*\(.*\bAS\s+(?:BIGINT|INTEGER|INT|SMALLINT|TINYINT)\s*\)"
    r")\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ZERO_DIVISOR = re.compile(
    r"/\s*(?:(\d*\.\d+(?:[eE][+-]?\d+)?|\d+\.(?!\.)(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)"
    r"|(?:REAL|DOUBLE)\s*\x00(\d+)\x00)"
)


def _left_operand_start(s: str, end: int) -> int:
    """Index where the SQL operand ending at ``end`` (exclusive) begins:
    a balanced-paren call/group, a masked literal, a bare token, or a
    chained mix of those (f(x).field[i].g)."""
    j = end
    while j > 0 and s[j - 1].isspace():
        j -= 1
    while True:
        while j > 0 and (s[j - 1].isalnum() or s[j - 1] in "_.$\x00"):
            j -= 1
        if j > 0 and s[j - 1] in ")]":
            close, open_ = (")", "(") if s[j - 1] == ")" else ("]", "[")
            depth = 0
            while j > 0:
                j -= 1
                if s[j] == close:
                    depth += 1
                elif s[j] == open_:
                    depth -= 1
                    if depth == 0:
                        break
            continue  # absorb the call name / subscript base / chain
        break
    # a masked literal may carry a typed-literal keyword prefix
    # (REAL '0.0' → REAL \x00n\x00) — absorb it into the operand
    if s[j:end].strip().startswith("\x00"):
        k = j
        while k > 0 and s[k - 1].isspace():
            k -= 1
        w = k
        while w > 0 and (s[w - 1].isalnum() or s[w - 1] == "_"):
            w -= 1
        if s[w:k].upper() in {
            "REAL", "DOUBLE", "BIGINT", "INTEGER", "SMALLINT",
            "TINYINT", "DECIMAL", "CHAR", "VARCHAR",
        }:
            return w
    return j


def _division_compat(sql: str, literals: list[str]) -> str:
    """Apply the two Presto division rewrites (module comment above).
    Runs on masked SQL, right-to-left so indices stay valid."""
    matches = list(_ZERO_DIVISOR.finditer(sql))
    for m in reversed(matches):
        if m.group(1) is not None:
            is_zero = float(m.group(1)) == 0.0
        else:
            lit = literals[int(m.group(2))][1:-1].replace("''", "'")
            try:
                is_zero = float(lit) == 0.0
            except ValueError:
                is_zero = False
        if not is_zero:
            continue
        start = _left_operand_start(sql, m.start())
        left = sql[start : m.start()].rstrip()
        if not left:
            continue
        sql = (
            sql[:start]
            + f"(CAST({left} AS DOUBLE) * CAST('Infinity' AS DOUBLE))"
            + sql[m.end() :]
        )
    sql = _INT_DIV.sub(r"(\1 DIV \2)", sql)
    # general statically-integral operands (CAST(.. AS BIGINT)/13, typed
    # integer literals): Presto divides integrally there too
    # (BigintOperators.divide).  Right-to-left with a moving limit so
    # replacements never invalidate pending positions.
    limit = len(sql)
    while True:
        i = sql.rfind("/", 0, limit)
        if i < 0:
            return sql
        start = _left_operand_start(sql, i)
        left = sql[start:i].strip()
        rend = _forward_operand_end(sql, i + 1)
        right = sql[i + 1 : rend].strip()
        if (
            left
            and right
            and _STATIC_INTEGRAL_OPERAND.match(left)
            and _STATIC_INTEGRAL_OPERAND.match(right)
        ):
            sql = sql[:start] + f"({left} DIV {right})" + sql[rend:]
            limit = start
        else:
            limit = i


def _contains_rewrite(args: list[str]) -> str | None:
    """Presto CONTAINS(array, x) is array membership
    (ArrayContains.java); Spark's contains is the string function.  A
    literal NULL needle is NULL (Spark's array_contains rejects an
    untyped NULL at analysis)."""
    if len(args) != 2:
        return None
    if args[1].strip().upper() == "NULL":
        return "NULL"
    return f"array_contains({args[0]}, {args[1]})"


def _array_position_null_rewrite(args: list[str]) -> str | None:
    """array_position(arr, NULL) is NULL (ArrayPositionFunction)."""
    if len(args) == 2 and args[1].strip().upper() == "NULL":
        return "NULL"
    return None


_NUMERIC_LIT = re.compile(
    r"[-+]?\d+(\.\d+)?([eE][+-]?\d+)?"
    r"|(?:TRY_)?CAST\s*\(.*\bAS\s+DECIMAL\s*\([^()]*\)\s*\)",
    re.IGNORECASE | re.DOTALL,
)


def _array_position_numeric_rewrite(args: list[str]) -> str | None:
    """Presto coerces mixed decimal scales / int-vs-decimal in
    array_position (ArrayPositionFunction signature unification); Spark
    requires the needle type to equal the element type exactly.  For a
    literal array with decimal content, compare as DOUBLE (exact at
    these literal magnitudes; the int-only path is left alone so
    beyond-2^53 bigints never lose precision)."""
    if len(args) != 2:
        return None
    arr, x = args[0].strip(), args[1].strip()
    if not re.match(r"^array\s*\(", arr, re.IGNORECASE):
        return None
    if "." not in arr and "." not in x:
        return None
    if not _NUMERIC_LIT.fullmatch(x):
        return None
    return (
        f"array_position(transform({arr}, __ap -> CAST(__ap AS DOUBLE)),"
        f" CAST({x} AS DOUBLE))"
    )


# --- decimal-scale harmonization for literal array operands ------------------
# Presto unifies mixed-scale decimal (and int-with-decimal) operands to
# the max scale (DecimalType common super type); Spark requires exact
# element-type matches in array functions and comparisons.  For literal
# operands the unification is static: pad every element to the max
# scale as DECIMAL(38, s) — padding zeros never changes the value.


def _parse_numeric_array(text: str, literals: list[str], need_dec=True):
    """array(..) ctor of int/decimal/null literals → node list, or
    None; with need_dec, requires at least one decimal so int-only
    arrays are left in integer typing."""
    from prestodb_presto_spark.functions import json_static

    node = json_static.parse_literal_expr(text, literals)
    if node is None or node[0] != "array":
        return None
    els = node[1]
    if not els or not all(e[0] in ("int", "dec", "null") for e in els):
        return None
    if need_dec and not any(e[0] == "dec" for e in els):
        return None
    return els


def _numeric_node(text: str, literals: list[str]):
    from prestodb_presto_spark.functions import json_static

    node = json_static.parse_literal_expr(text, literals)
    if node is not None and node[0] in ("int", "dec", "null"):
        return node
    return None


def _emit_dec38(node, s: int, literals: list[str]) -> str:
    from decimal import Decimal

    if node[0] == "null":
        return f"CAST(NULL AS DECIMAL(38,{s}))"
    d = Decimal(node[1]).quantize(Decimal(1).scaleb(-s))
    literals.append("'" + format(d, "f") + "'")
    return f"CAST(\x00{len(literals) - 1}\x00 AS DECIMAL(38,{s}))"


def _node_scale(n) -> int:
    return n[3] if n[0] == "dec" else 0


def _unified_scale(groups) -> int:
    return max(
        (_node_scale(n) for g in groups for n in g if n[0] != "null"),
        default=0,
    )


def _array_numeric_binary_rewrite(name: str):
    """array_intersect/array_remove-style: harmonize two literal
    numeric operands (array,array) or (array,scalar) to DECIMAL(38,s)."""

    def make(literals: list[str]):
        def fn(args: list[str]) -> str | None:
            if len(args) != 2:
                return None
            a = _parse_numeric_array(args[0].strip(), literals, need_dec=False)
            if a is None:
                return None
            b = _parse_numeric_array(args[1].strip(), literals, need_dec=False)
            if b is not None:
                groups = [a, b]
            else:
                sc = _numeric_node(args[1].strip(), literals)
                if sc is None:
                    return None
                groups = [a, [sc]]
            # the unification is only needed (and only correct) when a
            # decimal is involved somewhere across the operands
            if not any(n[0] == "dec" for g in groups for n in g):
                return None
            s = _unified_scale(groups)
            sides = [
                "array(" + ", ".join(_emit_dec38(n, s, literals) for n in g) + ")"
                for g in (groups[0],)
            ]
            if b is not None:
                rhs = (
                    "array(" + ", ".join(_emit_dec38(n, s, literals) for n in b) + ")"
                )
            else:
                rhs = _emit_dec38(groups[1][0], s, literals)
            return f"{name}({sides[0]}, {rhs})"

        return fn

    return make


def _array_cmp_decimal_compat(sql: str, literals: list[str]) -> str:
    """Comparisons between literal numeric arrays of differing decimal
    scales (ARRAY [..10-scale..] = ARRAY [.., 0])."""
    if "array" not in sql.lower():
        return sql
    out = sql
    pos = 0
    while True:
        m = _CMP_OP.search(out, pos)
        if not m:
            return out
        op = m.group(1)
        if op == "=" and m.start() > 0 and out[m.start() - 1] in "<>!=":
            pos = m.end()
            continue
        lstart = _left_operand_start(out, m.start())
        left = out[lstart : m.start()].strip()
        rend = _forward_operand_end(out, m.end())
        right = out[m.end() : rend].strip()
        if not (
            re.match(r"^array\s*\(", left, re.IGNORECASE)
            and re.match(r"^array\s*\(", right, re.IGNORECASE)
        ):
            pos = m.end()
            continue
        a = _parse_numeric_array(left, literals)
        b = _parse_numeric_array(right, literals)
        if a is None or b is None:
            pos = m.end()
            continue
        s = _unified_scale([a, b])
        la = "array(" + ", ".join(_emit_dec38(n, s, literals) for n in a) + ")"
        rb = "array(" + ", ".join(_emit_dec38(n, s, literals) for n in b) + ")"
        repl = f"{la} {op} {rb}"
        out = out[:lstart] + repl + out[rend:]
        pos = lstart + len(repl)


def _concat_null_array_rewrite(args: list[str]) -> str | None:
    """concat over arrays with a literal NULL argument is NULL
    (ArrayConcatFunction); Spark cannot type the untyped NULL."""
    if len(args) < 2:
        return None
    if not any(a.strip().upper() == "NULL" for a in args):
        return None
    if not any(
        re.match(r"^array\s*\(", a.strip(), re.IGNORECASE) for a in args
    ):
        return None
    return "CAST(NULL AS ARRAY<STRING>)"


# element || array / array || element (ArrayConcatUtils appendElement/
# prependElement): Spark's || lowers both sides to concat() and fails on
# the type mix.  Statically decidable when one side is textually an
# array(..) constructor and the other a scalar literal (number, masked
# string, boolean, or TYPE 'literal').
_TYPED_KEYWORDS = (
    r"(?:DATE|TIME|TIMESTAMP|BIGINT|INTEGER|SMALLINT|TINYINT|DOUBLE|REAL"
    r"|CHAR|VARCHAR|DECIMAL)"
)
_FWD_SCALAR = re.compile(
    r"\s*(" + _TYPED_KEYWORDS + r"\s*\x00\d+\x00"
    r"|\x00\d+\x00|TRUE\b|FALSE\b|[-+]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)",
    re.IGNORECASE,
)
_BWD_SCALAR = re.compile(
    r"((?:" + _TYPED_KEYWORDS + r"\s*)?\x00\d+\x00"
    r"|\bTRUE|\bFALSE|(?<![\w.\x00])\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)\s*$",
    re.IGNORECASE,
)


def _rev_array_span(s: str) -> int | None:
    """Start index of a trailing ``array( ... )`` constructor in s, else
    None (rejects array_append/CAST/other callables)."""
    t = s.rstrip()
    if not t.endswith(")"):
        return None
    depth = 0
    for i in range(len(t) - 1, -1, -1):
        if t[i] == ")":
            depth += 1
        elif t[i] == "(":
            depth -= 1
            if depth == 0:
                m = re.search(r"\barray\s*$", t[:i], re.IGNORECASE)
                return m.start() if m else None
    return None


def _all_nested(arr: str) -> bool | None:
    """True if every element of a textual array(..) ctor is itself an
    array(..) ctor, False if none are; None when mixed/empty."""
    m = re.match(r"\s*array\s*\(", arr, re.IGNORECASE)
    if not m:
        return None
    _, args = _scan_balanced(arr, m.end() - 1)
    if len(args) == 1 and not args[0].strip():
        return None
    nested = [
        bool(re.match(r"^\s*array\s*\(", a, re.IGNORECASE)) for a in args
    ]
    if all(nested):
        return True
    if not any(nested):
        return False
    return None


def _fold_dec_concat(arr_txt, sc_txt, literals, append: bool) -> str | None:
    """array(..) ++ scalar with decimal literals: fold to one array
    constructor at the unified scale (Presto's common-supertype rule)."""
    a = _parse_numeric_array(arr_txt, literals)
    if a is None:
        return None
    sc = _numeric_node(sc_txt, literals)
    if sc is None:
        return None
    nodes = a + [sc] if append else [sc] + a
    s = _unified_scale([nodes])
    return "array(" + ", ".join(_emit_dec38(n, s, literals) for n in nodes) + ")"


def _element_array_concat(sql: str, literals: list[str]) -> str:
    out = sql
    pos = 0
    while True:
        idx = out.find("||", pos)
        if idx == -1:
            return out
        left_txt, right_txt = out[:idx], out[idx + 2 :]
        la = _rev_array_span(left_txt)
        am0 = re.match(r"\s*array\s*\(", right_txt, re.IGNORECASE)
        # flat-array element || array-of-arrays (ArrayConcatUtils
        # appendElement/prependElement with an array element type)
        if la is not None and am0:
            aend, _ = _scan_balanced(right_txt, am0.end() - 1)
            rarr = right_txt[am0.start() : aend].strip()
            larr = left_txt[la:].strip()
            ln, rn = _all_nested(larr), _all_nested(rarr)
            if ln is False and rn is True:
                repl = f"array_prepend({rarr}, {larr})"
                out = out[:la] + repl + right_txt[aend:]
                pos = la + len(repl)
                continue
            if ln is True and rn is False:
                repl = f"array_append({larr}, {rarr})"
                out = out[:la] + repl + right_txt[aend:]
                pos = la + len(repl)
                continue
            pos = idx + 2
            continue
        # array(..) || scalar-literal → array_append (or a folded
        # array constructor when decimal scales must unify)
        mr = _FWD_SCALAR.match(right_txt)
        if la is not None and mr:
            arr = left_txt[la:].strip()
            repl = _fold_dec_concat(
                arr, mr.group(1), literals, append=True
            ) or f"array_append({arr}, {mr.group(1)})"
            out = out[:la] + repl + right_txt[mr.end() :]
            pos = la
            continue
        # scalar-literal || array(..) → array_prepend
        ml = _BWD_SCALAR.search(left_txt)
        am = re.match(r"\s*array\s*\(", right_txt, re.IGNORECASE)
        if ml and am:
            aend, _ = _scan_balanced(right_txt, am.end() - 1)
            arr = right_txt[am.start() : aend].strip()
            repl = _fold_dec_concat(
                arr, ml.group(1), literals, append=False
            ) or f"array_prepend({arr}, {ml.group(1)})"
            out = out[: ml.start(1)] + repl + right_txt[aend:]
            pos = ml.start(1)
            continue
        pos = idx + 2


def _array_except_null_rewrite(args: list[str]) -> str | None:
    """array_except with a NULL argument is NULL (ArrayExceptFunction);
    Spark can't type an untyped NULL array argument."""
    if len(args) == 2 and any(a.strip().upper() == "NULL" for a in args):
        return "NULL"
    return None


def _reduce_rewrite(args: list[str]) -> str | None:
    """reduce(arr, 0, ..) with BIGINT-range array elements: Presto
    coerces the initial state to the element type; Spark pins the
    accumulator to the init literal's type (INT) and rejects the merge.
    Widen an integer-literal init to BIGINT when the array text carries
    beyond-int32 literals (ArrayReduceFunction.java)."""
    if len(args) not in (3, 4):
        return None
    if re.fullmatch(r"-?\d+", args[1].strip()) and re.search(r"\b\d{10,}\b", args[0]):
        rest = ", ".join(args[2:])
        return f"reduce({args[0]}, CAST({args[1]} AS BIGINT), {rest})"
    return None


# --- scalar lambda application (FunctionAssertions harness surface) ---------
# The reference's lambda tests exercise apply(x, f), invoke(f) and
# "$internal$bind" — scalar lambda application with partial binding.
# Spark's lambda machinery only runs inside higher-order functions, so
# each binding lowers to a single-element transform:
#   apply(v, x -> body)  ==  element_at(transform(array(v), x -> body), 1)
# and bind chains nest one transform per bound variable (lambda capture
# carries outer variables into inner bodies).
_BIND_CALL = re.compile(r'^\s*["`]\$internal\$bind["`]\s*\(', re.IGNORECASE)


def _parse_lambda(lam: str) -> tuple[list[str], str] | None:
    m = re.match(r"^\s*\(([^)]*)\)\s*->\s*(.*)$", lam, re.DOTALL)
    if m:
        return [p.strip() for p in m.group(1).split(",") if p.strip()], m.group(2)
    m = re.match(r"^\s*(\w+)\s*->\s*(.*)$", lam, re.DOTALL)
    if m:
        return [m.group(1)], m.group(2)
    return None


def _nested_apply(values: list[str], params: list[str], body: str) -> str | None:
    if len(values) != len(params):
        return None
    expr = body
    for p, v in reversed(list(zip(params, values))):
        vs = v.strip()
        # beta-reduce simple literal bindings textually — this lets the
        # static cast rewrites (rounding, truncation) see the value's
        # type, matching Presto's pre-bound constant folding
        if re.fullmatch(
            r"[-+]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|\x00\d+\x00|TRUE|FALSE|NULL",
            vs,
            re.IGNORECASE,
        ) and not re.search(
            rf"[(,]?\s*\b{re.escape(p)}\b[^)>]*->", expr
        ):
            sub = f"({vs})" if vs[0] in "+-" else vs
            expr = re.sub(rf"\b{re.escape(p)}\b", sub, expr)
        else:
            expr = f"element_at(transform(array({v}), {p} -> {expr}), 1)"
    return f"({expr})"


def _apply_invoke_rewrite(applied: bool):
    def fn(args: list[str]) -> str | None:
        if applied:
            if len(args) != 2:
                return None
            w, f = args
            values: list[str] = []
        else:
            if len(args) != 1:
                return None
            w, f = None, args[0]
            values = []
        bm = _BIND_CALL.match(f)
        if bm:
            _, bind_args = _scan_balanced(f, f.index("("))
            if len(bind_args) < 2:
                return None
            values = bind_args[:-1]
            f = bind_args[-1]
        if w is not None:
            values = values + [w]
        parsed = _parse_lambda(f)
        if not parsed:
            return None
        params, body = parsed
        if not params and not values:
            return f"({body})"  # invoke(() -> X)
        return _nested_apply(values, params, body)

    return fn


def _internal_try_rewrite(literals: list[str]):
    # "$internal$try"(() -> X) is the harness spelling of TRY(X)
    def fn(args: list[str]) -> str | None:
        if len(args) != 1:
            return None
        m = re.match(r"^\s*\(\s*\)\s*->\s*(.*)$", args[0], re.DOTALL)
        if not m:
            return None
        inner = m.group(1).strip()
        # TRY(json_parse('lit')): parse failure is statically decidable
        jm = re.fullmatch(
            r"json_parse\s*\(\s*\x00(\d+)\x00\s*\)", inner, re.IGNORECASE
        )
        if jm:
            import json as _json

            content = literals[int(jm.group(1))][1:-1].replace("''", "'")
            try:
                _json.loads(content)
            except ValueError:
                return "NULL"
            return f"({inner})"
        try:
            return _try_rewrite([inner])
        except ValueError:
            return None

    return fn


def _harness_lambda_compat(sql: str, literals: list[str]) -> str:
    if "apply" not in sql.lower() and "invoke" not in sql.lower() \
            and "$internal$" not in sql:
        return sql
    # the quoted name defeats \b-matching in _rewrite_calls; alias it
    # (the identifier-quote pass has already turned " into `)
    out = sql.replace('"$internal$try"', "__internal_try")
    out = out.replace("`$internal$try`", "__internal_try")
    for _ in range(8):  # nested applies: fixpoint over the emitted bodies
        prev = out
        out = _rewrite_calls(out, "__internal_try", _internal_try_rewrite(literals))
        out = _rewrite_calls(out, "apply", _apply_invoke_rewrite(True))
        out = _rewrite_calls(out, "invoke", _apply_invoke_rewrite(False))
        if out == prev:
            break
    return out.replace("__internal_try", '"$internal$try"')


_FROM_PAREN = re.compile(r"(?i)\bFROM\s*\(")

_REL_KEYWORDS = re.compile(
    r"(?i)^(GROUP|WHERE|ORDER|LIMIT|UNION|EXCEPT|INTERSECT|HAVING|ON|"
    r"JOIN|CROSS|LEFT|RIGHT|FULL|INNER|NATURAL|WINDOW)\b"
)


def _depth0_join(inner: str) -> bool:
    depth = 0
    i, n = 0, len(inner)
    while i < n:
        ch = inner[i]
        if ch == "'":
            j = inner.find("'", i + 1)
            i = (j if j != -1 else n) + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and ch in "Jj" and re.match(
            r"(?i)JOIN\b", inner[i:]
        ) and (i == 0 or not (inner[i - 1].isalnum() or inner[i - 1] == "_")):
            return True
        i += 1
    return False


def _from_join_parens_strip(sql: str) -> str:
    """``FROM (a JOIN b ...)`` — Presto's grammar allows a parenthesized
    join relation (SqlBase.g4 relation); Spark's does not (the UNNEST
    lowering's LATERAL VIEW cannot sit inside parens either).  The
    parens are redundant when the group is not aliased — drop them.  A
    subquery (inner text starting with SELECT/VALUES/WITH) keeps its
    parens."""
    out = sql
    pos = 0
    while True:
        m = _FROM_PAREN.search(out, pos)
        if not m:
            return out
        open_idx = out.index("(", m.end() - 1)
        end, _ = _scan_balanced(out, open_idx)
        inner = out[open_idx + 1 : end - 1]
        lead = inner.lstrip()
        if re.match(r"(?i)(SELECT|VALUES|WITH|TABLE)\b", lead) or not _depth0_join(inner):
            pos = end
            continue
        rest = out[end:].lstrip()
        if rest[:1].isalpha() and not _REL_KEYWORDS.match(rest):
            pos = end  # aliased derived table — leave it
            continue
        out = out[:open_idx] + inner.strip() + out[end:]
        # re-scan from FROM: the stripped text may expose nesting


# --- 1-based subscript (presto-parser SqlBase.g4 subscript) -----------------
# Presto `expr[i]` is 1-based array/map access; Spark's [] is 0-based
# for arrays.  element_at is 1-based for both arrays and maps.  Runs
# after ARRAY[..] literals are rewritten, so remaining brackets are
# subscripts.
def _subscript_compat(sql: str) -> str:
    out = sql
    while True:
        idx = None
        for m in re.finditer(r"\[", out):
            j = m.start()
            if j == 0:
                continue
            prev = out[j - 1]
            if prev.isalnum() or prev in ")]_\x00":
                idx = j
                break
        if idx is None:
            return out
        depth = 0
        k = idx
        while k < len(out):
            if out[k] == "[":
                depth += 1
            elif out[k] == "]":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        if depth != 0:
            return out
        start = _left_operand_start(out, idx)
        base = out[start:idx]
        index = out[idx + 1 : k]
        # a runtime BIGINT-typed index (Presto subscripts are BIGINT)
        # fails Spark's element_at(array, INT) signature; narrow it.
        # Map subscripts never carry an AS BIGINT cast in practice, and
        # numeric map keys upcast INT→BIGINT implicitly anyway.
        if re.search(r"(?i)\bAS\s+BIGINT\b", index):
            index = f"CAST(({index.strip()}) AS INT)"
        out = out[:start] + f"element_at({base}, {index})" + out[k + 1 :]


# --- JSON cast compatibility (JsonOperators.java, JsonCastsRow/Map...) ------
# CAST(complex AS JSON): Presto renders compact JSON — arrays as-is,
# maps with SORTED keys, rows as POSITIONAL arrays.  Spark's to_json
# matches Presto's scalar rendering exactly (NaN/Infinity quoted,
# Java Double.toString, plain decimals); sorting map entries and
# flattening rows are the two deltas.  CAST(JSON 'lit' AS scalar):
# Presto parses the JSON value first ('"128"'→128, 128.9→round,
# true→1); statically decidable for literals.
def _element_json(expr: str) -> str:
    j = f"to_json(array({expr}))"
    return f"substr({j}, 2, length({j}) - 2)"


def _presto_json_value(e: str, literals: list[str] | None = None) -> str | None:
    """Presto renders ROW values in JSON as POSITIONAL arrays
    (RowToJsonCast); Spark's to_json renders named objects.  Render the
    statically-visible constructor shapes — ROW(..) (nested to any
    depth), array(..) with ROW items, ARRAY_AGG(ROW(..)) — as
    concatenated positional JSON text; anything else defers to the
    caller's scalar/to_json paths."""
    def _lit(text: str) -> str:
        # mask emitted literals so later passes (subscript, renames)
        # can't rewrite inside them
        if literals is None:
            return "'" + text.replace("'", "''") + "'"
        literals.append("'" + text.replace("'", "''") + "'")
        return f"\x00{len(literals) - 1}\x00"

    def _fallback(a: str) -> str:
        x = _element_json(a)
        if re.fullmatch(r"[A-Za-z_][\w.]*", a.strip()):
            # a bare column may hold a ROW value: its to_json rendering
            # starts with {"field0": — flatten the anonymous-field
            # objects to positional arrays (string scalars render
            # quoted, so the guard cannot misfire on text values)
            key_pat = _lit('"field[0-9]+":')
            empty = _lit("")
            braces = _lit("{}")
            brackets = _lit("[]")
            guard = _lit('{"field0":%')
            flat = (
                f"translate(regexp_replace({x}, {key_pat}, {empty}), "
                f"{braces}, {brackets})"
            )
            return (
                f"(CASE WHEN {x} LIKE {guard} THEN {flat} ELSE {x} END)"
            )
        return x

    t = e.strip()
    rm = re.match(r"^ROW\s*\(", t, re.IGNORECASE)
    if rm:
        end, args = _scan_balanced(t, t.index("("))
        if t[end:].strip() == "":
            fields = ", ".join(
                _presto_json_value(a, literals) or _fallback(a) for a in args
            )
            return f"concat('[', concat_ws(',', {fields}), ']')"
        return None
    am = re.match(r"^array\s*\(", t, re.IGNORECASE)
    if am:
        end, items = _scan_balanced(t, t.index("("))
        if t[end:].strip() == "" and any(
            re.match(r"^ROW\s*\(", it.strip(), re.IGNORECASE) for it in items
        ):
            fields = ", ".join(
                _presto_json_value(it, literals) or _element_json(it) for it in items
            )
            return f"concat('[', concat_ws(',', {fields}), ']')"
        return None
    gm = re.match(r"^ARRAY_AGG\s*\(", t, re.IGNORECASE)
    if gm:
        end, args = _scan_balanced(t, t.index("("))
        if t[end:].strip() == "" and len(args) == 1:
            elem = _presto_json_value(args[0].strip(), literals)
            if elem is not None:
                # aggregate the per-row rendered text; concat_ws of the
                # empty aggregation renders '[]' like Presto's empty agg
                return (
                    f"concat('[', concat_ws(',', array_agg({elem})), ']')"
                )
        return None
    return None


def _json_cast_rewrite(literals: list[str]):
    def fn(args: list[str]) -> str | None:
        if not args:
            return None
        # angle-bracket generics (MAP<K, V>) carry commas the paren
        # scanner splits on — a CAST has exactly one argument, rejoin
        parts = _AS_SPLIT.split(", ".join(args) if len(args) > 1 else args[0])
        if len(parts) < 2:
            return None
        expr, typ = " AS ".join(parts[:-1]), parts[-1].strip()
        t_up = typ.upper()
        if t_up == "JSON":
            # literal constructor trees fold statically to Presto's
            # canonical JSON text (sorted-object maps with string keys,
            # positional rows, Java double renderings, raw JSON splices)
            from prestodb_presto_spark.functions import json_static

            node = json_static.parse_literal_expr(expr, literals)
            if node is not None:
                if node[0] == "null":
                    # CAST(typed NULL AS JSON) is SQL NULL, not 'null'
                    return "NULL"
                rendered = json_static.render_presto_json(node)
                if rendered is not None:
                    literals.append("'" + rendered.replace("'", "''") + "'")
                    # keep the JSON typing visible so a chained
                    # CAST(... AS MAP/ARRAY/ROW) re-enters the static
                    # JSON→type path; _TYPED_LIT_POST unwraps it later
                    return f"JSON \x00{len(literals) - 1}\x00"
            inner = expr.strip()
            while True:  # unwrap textual casts to find the constructor
                m = re.match(r"^(?:try_)?cast\s*\(", inner, re.IGNORECASE)
                if not m:
                    break
                _, cargs = _scan_balanced(inner, inner.index("("))
                cp = _AS_SPLIT.split(cargs[0])
                inner = (" AS ".join(cp[:-1]) if len(cp) >= 2 else cargs[0]).strip()
            up = inner.upper()
            if up == "NULL":
                return "NULL"
            if up.startswith("MAP") or re.match(
                r"(?is)^\(CASE\b.*\bELSE\s+MAP\s*\(.*END\s*\)$", inner
            ):
                # the CASE form is the TRY(MAP(..)) null-key guard; a
                # runtime-NULL map casts to SQL NULL, not 'null' text
                j = f"to_json(map_from_entries(array_sort(map_entries({expr}))))"
                if up.startswith("MAP"):
                    return j
                return f"(CASE WHEN ({expr}) IS NULL THEN NULL ELSE {j} END)"
            if up.startswith("ARRAY"):
                pj = _presto_json_value(inner, literals)
                return pj if pj is not None else f"to_json({expr})"
            if up.startswith("ROW") and "(" in inner:
                pj = _presto_json_value(inner, literals)
                if pj is not None:
                    return pj
                _, rargs = _scan_balanced(inner, inner.index("("))
                fields = ", ".join(f"{_element_json(a)}" for a in rargs)
                return f"concat('[', concat_ws(',', {fields}), ']')"
            # already-JSON values cast to JSON are identity
            if re.match(
                r"(?:json_parse|json_extract)\s*\(|JSON\s*\x00", inner,
                re.IGNORECASE,
            ):
                return None
            # any other scalar: Presto renders its JSON form ('abc' →
            # '"abc"', NaN → '"NaN"'); to_json of a 1-element array,
            # brackets stripped, matches it exactly
            return _element_json(expr)
        # literal constructor → complex target: Presto's complex-CAST
        # value coercions match the JSON coercion matrix, so route the
        # statically-parsed value tree through it
        if re.match(r"^(?:MAP|ARRAY|ROW)\s*[<(]", t_up):
            from prestodb_presto_spark.functions import json_static

            tyc = json_static.parse_type(typ)
            if tyc is not None and tyc[0] in ("map", "array", "row"):
                node = json_static.parse_literal_expr(expr, literals)
                if node is not None and node[0] != "json":
                    try:
                        val = json_static.node_to_value(node)
                    except Exception:
                        val = Ellipsis
                    if val is not Ellipsis:
                        folded = json_static.json_to_expr(val, tyc, literals)
                        if folded is not None:
                            return folded
        # CAST(JSON 'literal' AS scalar): parse the JSON value statically
        jm = re.fullmatch(r"JSON\s*\x00(\d+)\x00", expr.strip(), re.IGNORECASE)
        if not jm:
            if re.fullmatch(
                r"cast\s*\(\s*null\s+as\s+json\s*\)", expr.strip(), re.IGNORECASE
            ):
                return "NULL"
            return None
        content = literals[int(jm.group(1))][1:-1].replace("''", "'").strip()
        base = re.match(r"[A-Z]+", t_up)
        base = base.group(0) if base else t_up
        if content == "null":
            return "NULL"
        # full Presto JSON→type coercion matrix for any statically
        # parseable target type (JsonToXxxCasts)
        from prestodb_presto_spark.functions import json_static

        ty = json_static.parse_type(typ)
        if ty is not None:
            import json as _jsonlib
            from decimal import Decimal as _Dec

            try:
                # exact number lexemes: decimal targets read the raw
                # text (JsonToDecimalCast), not a double round-trip
                val = _jsonlib.loads(content, parse_float=_Dec)
            except ValueError:
                val = Ellipsis  # malformed JSON: leave to runtime
            if val is not Ellipsis:
                folded = json_static.json_to_expr(val, ty, literals)
                if folded is not None:
                    return folded
        if base == "ARRAY":
            import json as _json

            try:
                arr = _json.loads(content)
            except ValueError:
                return None
            if not isinstance(arr, list):
                return None
            els = []
            for e in arr:
                if e is None:
                    els.append("NULL")
                elif isinstance(e, bool):
                    els.append("TRUE" if e else "FALSE")
                elif isinstance(e, (int, float)):
                    els.append(repr(e))
                elif isinstance(e, str):
                    els.append("'" + e.replace("'", "''") + "'")
                else:
                    return None  # nested structures: leave to runtime
            return f"CAST(array({', '.join(els)}) AS {_translate_type(typ)})"
        val: object = content
        if content in ("true", "false"):
            val = content == "true"
        elif content.startswith('"') and content.endswith('"') and len(content) >= 2:
            val = content[1:-1]
        if base in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
            try:
                f_ = float(val) if not isinstance(val, bool) else int(val)
                n = int(f_) if float(f_).is_integer() else round(float(f_))
                return f"CAST({n} AS {_translate_type(typ)})"
            except (TypeError, ValueError):
                return None
        if base in ("DOUBLE", "REAL"):
            try:
                f_ = float(val) if not isinstance(val, bool) else float(int(val))
                return f"CAST('{f_}' AS {_translate_type(typ)})"
            except (TypeError, ValueError):
                return None
        if base == "BOOLEAN":
            if isinstance(val, bool):
                return "TRUE" if val else "FALSE"
            if isinstance(val, str) and val.lower() in ("true", "false"):
                return "TRUE" if val.lower() == "true" else "FALSE"
            try:
                return "TRUE" if float(val) != 0 else "FALSE"
            except (TypeError, ValueError):
                return None
        if base == "VARCHAR":
            if isinstance(val, bool):
                s = "true" if val else "false"
            else:
                s = str(val)
            return "'" + s.replace("'", "''") + "'"
        return None

    return fn


# --- CHAR(n) comparison compatibility (CharType.java) -----------------------
# Presto compares CHAR values space-insensitively (the shorter operand
# is notionally padded).  The engine pads CHAR casts on read
# (_cast_rewrite → rpad); an `=` whose operand carries a CHAR cast
# additionally rtrims both sides so 'ab  ' = 'ab' holds.
_CHAR_CAST = re.compile(r"\bAS\s+CHAR\s*\(", re.IGNORECASE)


def _forward_operand_end(s: str, start: int) -> int:
    i, n = start, len(s)
    while i < n and s[i].isspace():
        i += 1
    m = re.match(r"\x00\d+\x00", s[i:])
    if m:
        return i + m.end()
    j = i
    while j < n and (s[j].isalnum() or s[j] in "_.$"):
        j += 1
    if j < n and s[j] == "(":
        depth = 0
        while j < n:
            if s[j] == "(":
                depth += 1
            elif s[j] == ")":
                depth -= 1
                if depth == 0:
                    j += 1
                    break
            j += 1
    return j


# --- ROW equality (RowEqualOperator.java) -----------------------------------
# Spark cannot order/compare structs containing MAP fields; Presto row
# equality is field-wise.  When BOTH sides are textual row(..)
# constructors, decompose statically so the map-equality compat below
# picks up any MAP(..) = MAP(..) field comparisons.
_ROW_HEAD = re.compile(r"\brow\s*\(", re.IGNORECASE)


def _row_eq_compat(sql: str) -> str:
    out = sql
    pos = 0
    while True:
        m = _ROW_HEAD.search(out, pos)
        if not m:
            return out
        end1, args1 = _scan_balanced(out, m.end() - 1)
        m2 = re.match(r"\s*(!=|<>|=)\s*row\s*\(", out[end1:], re.IGNORECASE)
        if not m2:
            pos = m.end()
            continue
        op = m2.group(1)
        end2, args2 = _scan_balanced(out, end1 + m2.end() - 1)
        if len(args1) != len(args2):
            pos = m.end()
            continue
        terms = []
        for a, b in zip(args1, args2):
            a, b = a.strip(), b.strip()
            # MAP operands stay bare so _map_eq_compat's head-matcher
            # sees them; everything else gets precedence parens
            la = a if _MAP_HEAD.match(a) else f"({a})"
            rb = b if _MAP_HEAD.match(b) else f"({b})"
            terms.append(f"{la} = {rb}")
        conj = " AND ".join(terms)
        repl = f"({conj})" if op == "=" else f"(NOT ({conj}))"
        out = out[: m.start()] + repl + out[end2:]
        pos = m.start()


# --- MAP equality (MapOperators.java EQUAL/NOT_EQUAL) -----------------------
# Spark map types aren't comparable; Presto map equality is entry-set
# equality.  Sorted-entries arrays compare exactly when either operand
# is textually a MAP constructor.
_MAP_HEAD = re.compile(r"^\s*MAP\s*\(", re.IGNORECASE)
_MAP_EQ_OP = re.compile(r"(<>|!=|=)")


def _map_distinct_eq(left: str, right: str) -> str:
    """NULL-safe per-value map equality for IS DISTINCT FROM
    (MapDistinctFromOperator): NULL values compare as equal-to-NULL.
    Map-valued maps (Spark cannot <=> a map) compare via the values'
    canonical sorted-entry JSON rendering."""
    if re.search(r"array\s*\(\s*map", left + right, re.IGNORECASE):
        def vj(m: str) -> str:
            return (
                f"to_json(map_from_entries(array_sort(map_entries("
                f"element_at({m}, __k)))))"
            )

        cmp = f"{vj(left)} <=> {vj(right)}"
    else:
        cmp = f"element_at({left}, __k) <=> element_at({right}, __k)"
    return (
        f"(CASE WHEN size({left}) != size({right})"
        f" OR array_sort(map_keys({left})) != array_sort(map_keys({right}))"
        f" THEN FALSE ELSE forall(map_keys({left}),"
        f" __k -> {cmp}) END)"
    )


def _map_eq_compat(sql: str) -> str:
    if "MAP" not in sql.upper():
        return sql
    out = sql
    # IS [NOT] DISTINCT FROM with a map operand (Spark rejects map
    # ordering): a MAP constructor is never NULL, so vs literal NULL it
    # is statically distinct; map-vs-map uses NULL-safe value equality
    m = _CHAR_DISTINCT.search(out)
    while m:
        lstart = _left_operand_start(out, m.start())
        left = out[lstart : m.start()].strip()
        rend = _forward_operand_end(out, m.end())
        right = out[m.end() : rend].strip()
        def _null_map(s: str) -> bool:
            return s.upper() == "NULL" or bool(
                re.match(r"CAST\s*\(\s*NULL\s+AS\s+MAP", s, re.IGNORECASE)
            )

        mapish = _MAP_HEAD.match(left) or _MAP_HEAD.match(right) or (
            _null_map(left) and _null_map(right)
            and "MAP" in (left + right).upper()
        )
        if left and right and mapish:
            neg = bool(m.group(1))
            ln, rn = _null_map(left), _null_map(right)
            if ln or rn:
                distinct = not (ln and rn)
                repl = ("FALSE" if distinct else "TRUE") if neg else (
                    "TRUE" if distinct else "FALSE"
                )
            else:
                eq = _map_distinct_eq(left, right)
                repl = eq if neg else f"(NOT {eq})"
            out = out[:lstart] + repl + out[rend:]
            m = _CHAR_DISTINCT.search(out, lstart + len(repl))
        else:
            m = _CHAR_DISTINCT.search(out, m.end())
    pos = 0
    while True:
        m = _MAP_EQ_OP.search(out, pos)
        if not m:
            return out
        idx, op = m.start(), m.group(1)
        if op == "=" and idx > 0 and out[idx - 1] in "<>!=":
            pos = m.end()
            continue
        lstart = _left_operand_start(out, idx)
        left = out[lstart:idx].strip()
        rend = _forward_operand_end(out, m.end())
        right = out[m.end() : rend].strip()
        if left and right and (_MAP_HEAD.match(left) or _MAP_HEAD.match(right)):
            # three-valued per MapEqualOperator: FALSE on key-set
            # mismatch, else iterate values in map order and STOP at the
            # first NULL or FALSE comparison (Presto short-circuits NULL
            # before a later definite mismatch)
            eq = (
                f"(CASE WHEN size({left}) != size({right})"
                f" OR array_sort(map_keys({left})) !="
                f" array_sort(map_keys({right})) THEN FALSE"
                f" ELSE aggregate(map_keys({left}), CAST(TRUE AS BOOLEAN),"
                f" (__acc, __k) -> CASE WHEN __acc IS NULL OR NOT __acc"
                f" THEN __acc ELSE element_at({left}, __k) ="
                f" element_at({right}, __k) END)"
                f" END)"
            )
            repl = eq if op == "=" else f"(NOT {eq})"
            out = out[:lstart] + repl + out[rend:]
            pos = lstart + len(repl)
        else:
            pos = m.end()


# JSON equality is structural (JsonOperators.java EQUAL): member order
# is insignificant.  Statically decidable for literal-vs-literal.
_JSON_LIT_EQ = re.compile(
    r"JSON\s*\x00(\d+)\x00\s*"
    r"(=|!=|<>|IS\s+(?:NOT\s+)?DISTINCT\s+FROM)\s*"
    r"JSON\s*\x00(\d+)\x00",
    re.IGNORECASE,
)


def _json_literal_eq(sql: str, literals: list[str]) -> str:
    import json as _json

    def sub(m: re.Match) -> str:
        try:
            a = _json.loads(literals[int(m.group(1))][1:-1].replace("''", "'"))
            b = _json.loads(literals[int(m.group(3))][1:-1].replace("''", "'"))
        except ValueError:
            return m.group(0)
        op = re.sub(r"\s+", " ", m.group(2).upper())
        eq = a == b
        if op in ("=",):
            return "TRUE" if eq else "FALSE"
        if op in ("!=", "<>"):
            return "FALSE" if eq else "TRUE"
        if op == "IS DISTINCT FROM":
            return "FALSE" if eq else "TRUE"
        return "TRUE" if eq else "FALSE"  # IS NOT DISTINCT FROM

    return _JSON_LIT_EQ.sub(sub, sql)


_CMP_OP = re.compile(r"(<=|>=|<>|!=|=|<|>)")


# IPADDRESS ordering (IpAddressOperators lessThan): compares the
# 16-byte IPv6 form, IPv4 mapped into ::ffff:0:0/96 — NOT the canonical
# text (::1 < 1.2.3.5 numerically, but '1...' < ':...' lexically).
# Route ordering comparisons through the fixed-width hex key UDF;
# equality stays on the canonical text, which is already injective.
_IP_CMP = re.compile(r"(<=|>=|<>|<|>)")


def _ipaddress_cmp_compat(sql: str) -> str:
    if "__presto_ipaddress(" not in sql:
        return sql
    out = sql
    pos = 0
    while True:
        m = _IP_CMP.search(out, pos)
        if not m:
            return out
        op = m.group(1)
        if op == "<>":
            pos = m.end()
            continue
        lstart = _left_operand_start(out, m.start())
        left = out[lstart : m.start()].strip()
        rend = _forward_operand_end(out, m.end())
        right = out[m.end() : rend].strip()
        if left.startswith("__presto_ipaddress(") or right.startswith(
            "__presto_ipaddress("
        ):
            repl = (
                f"__presto_ipaddress_key({left}) {op} "
                f"__presto_ipaddress_key({right})"
            )
            out = out[:lstart] + repl + out[rend:]
            pos = lstart + len(repl)
        else:
            pos = m.end()


def _char_eq_compat(sql: str) -> str:
    out = sql
    pos = 0
    while True:
        m = _CMP_OP.search(out, pos)
        if not m:
            return out
        idx, op = m.start(), m.group(1)
        # skip lambda arrows and the tail of compound operators
        if op == ">" and idx > 0 and out[idx - 1] == "-":
            pos = m.end()
            continue
        if op == "=" and idx > 0 and out[idx - 1] in "<>!=":
            pos = m.end()
            continue
        lstart = _left_operand_start(out, idx)
        left = out[lstart:idx].strip()
        rend = _forward_operand_end(out, m.end())
        right = out[m.end() : rend].strip()
        if left and right and (_CHAR_CAST.search(left) or _CHAR_CAST.search(right)):
            repl = f"{_char_pad(left, right)} {op} {_char_pad(right, left)}"
            out = out[:lstart] + repl + out[rend:]
            pos = lstart + len(repl)
        else:
            pos = m.end()


def _char_pad(a: str, b: str) -> str:
    """Space-pad ``a`` to the common length with ``b`` — exactly
    Presto's CHAR comparison coercion (CharType.java): the shorter
    operand is padded, so trailing spaces are insignificant but
    sub-space characters (e.g. NUL) still order below ' '."""
    # coalesce keeps greatest's args non-null so the Presto
    # greatest-rewrite's NULL-propagation wrapper stays inert; rpad of
    # a NULL value is still NULL
    return (
        f"rpad({a}, greatest(coalesce(length({a}), 0),"
        f" coalesce(length({b}), 0)), ' ')"
    )


_CHAR_DISTINCT = re.compile(r"\bIS\s+(NOT\s+)?DISTINCT\s+FROM\b", re.IGNORECASE)
_CHAR_BETWEEN = re.compile(r"\bBETWEEN\b", re.IGNORECASE)


def _char_distinct_between_compat(sql: str) -> str:
    """CHAR coercion for IS [NOT] DISTINCT FROM and BETWEEN."""
    out = sql
    m = _CHAR_DISTINCT.search(out)
    while m:
        lstart = _left_operand_start(out, m.start())
        left = out[lstart : m.start()].strip()
        rend = _forward_operand_end(out, m.end())
        right = out[m.end() : rend].strip()
        if left and right and (_CHAR_CAST.search(left) or _CHAR_CAST.search(right)):
            mid = " IS NOT DISTINCT FROM " if m.group(1) else " IS DISTINCT FROM "
            repl = _char_pad(left, right) + mid + _char_pad(right, left)
            out = out[:lstart] + repl + out[rend:]
            m = _CHAR_DISTINCT.search(out, lstart + len(repl))
        else:
            m = _CHAR_DISTINCT.search(out, m.end())
    m = _CHAR_BETWEEN.search(out)
    while m:
        lstart = _left_operand_start(out, m.start())
        x = out[lstart : m.start()].strip()
        negated = False
        if x.upper() == "NOT":
            negated = True
            lstart = _left_operand_start(out, lstart)
            x = out[lstart:].split(" NOT ")[0].strip() if " NOT " in out[lstart:] \
                else out[lstart : m.start()].rsplit("NOT", 1)[0].strip()
        lo_end = _forward_operand_end(out, m.end())
        lo = out[m.end() : lo_end].strip()
        am = re.match(r"\s*AND\b", out[lo_end:], re.IGNORECASE)
        if not am:
            m = _CHAR_BETWEEN.search(out, m.end())
            continue
        hi_end = _forward_operand_end(out, lo_end + am.end())
        hi = out[lo_end + am.end() : hi_end].strip()
        if x and lo and hi and any(_CHAR_CAST.search(s) for s in (x, lo, hi)):
            body = (
                f"({_char_pad(x, lo)} >= {_char_pad(lo, x)}"
                f" AND {_char_pad(x, hi)} <= {_char_pad(hi, x)})"
            )
            repl = f"(NOT {body})" if negated else body
            out = out[:lstart] + repl + out[hi_end:]
            m = _CHAR_BETWEEN.search(out, lstart + len(repl))
        else:
            m = _CHAR_BETWEEN.search(out, m.end())
    return out


# --- LIKE compatibility (presto-parser SqlBase.g4 predicate / Types.java) ---
# Presto LIKE has NO default escape character (backslash is literal
# unless an ESCAPE clause names it); ESCAPE '' disables escaping; ESCAPE
# NULL yields NULL.  Spark always treats backslash as the escape and
# rejects empty/NULL ESCAPE.  All three are literal-pattern-statically
# rewritable: double backslashes (raw-literal mode: LIKE then reads an
# escaped, i.e. literal, backslash) and drop/replace the clause.
_LIKE_PAT = re.compile(
    r"((?:NOT\s+)?LIKE)\s*\x00(\d+)\x00(\s+ESCAPE\s+(?:\x00(\d+)\x00|NULL))?",
    re.IGNORECASE,
)


def _like_compat(sql: str, literals: list[str]) -> str:
    def sub(m: re.Match) -> str:
        op, pidx = m.group(1), int(m.group(2))
        esc_clause, eidx = m.group(3), m.group(4)
        if esc_clause and eidx is None:  # ESCAPE NULL -> NULL (any lhs)
            return "LIKE '%' AND NULL"
        if esc_clause:
            esc = literals[int(eidx)][1:-1]
            if esc != "":
                return m.group(0)  # real escape char: Spark supports it
            # ESCAPE '': no escaping — drop the clause, fall through
        pat = literals[pidx][1:-1]
        if "\\" not in pat:
            return f"{op} \x00{pidx}\x00"
        literals.append("'" + pat.replace("\\", "\\\\") + "'")
        return f"{op} \x00{len(literals) - 1}\x00"

    return _LIKE_PAT.sub(sub, sql)


# --- zoned TIME / TIMESTAMP literal compatibility ---------------------------
# Spark 4 has a TIME type but no TIME WITH TIME ZONE and no date-only
# zoned TIMESTAMP literal.  Presto compares zoned values by instant, so
# a zoned TIME literal lowers to the session-zone time-of-day (same
# instant, comparable with plain TIME), and a date-only zoned TIMESTAMP
# gains an explicit midnight.  Reference: TestTimeWithTimeZoneBase
# (session +06:09), SqlTimeWithTimeZone.
_TIME_ZONED = re.compile(r"\bTIME\s*\x00(\d+)\x00", re.IGNORECASE)
_TIME_ZONED_CONTENT = re.compile(
    r"^(\d{1,2}:\d{2}(?::\d{2}(?:\.\d+)?)?)\s+(\S+)$"
)
_TS_DATE_ZONE_CONTENT = re.compile(
    r"^(\d{4}-\d{1,2}-\d{1,2})\s+([+-]\d{2}:\d{2}|[A-Za-z][\w/+\-]*)$"
)
_TS_ZONED_NO_SECONDS = re.compile(
    r"^(\d{4}-\d{1,2}-\d{1,2})[ T](\d{1,2}:\d{2})\s+"
    r"([+-]\d{2}:\d{2}|[A-Za-z][\w/+\-]*)$"
)


_TEMPORAL_VARCHAR = re.compile(
    r"CAST\s*\(\s*(TIME|TIMESTAMP)\s*\x00(\d+)\x00\s+AS\s+(?:VARCHAR|STRING)\s*\)",
    re.IGNORECASE,
)
_INTERVAL_VARCHAR = re.compile(
    r"CAST\s*\(\s*INTERVAL\s*\x00(\d+)\x00\s*"
    r"(YEAR\s+TO\s+MONTH|DAY\s+TO\s+SECOND|DAY\s+TO\s+MINUTE|DAY\s+TO\s+HOUR"
    r"|HOUR\s+TO\s+SECOND|HOUR\s+TO\s+MINUTE|MINUTE\s+TO\s+SECOND"
    r"|YEAR|MONTH|DAY|HOUR|MINUTE|SECOND)"
    r"\s+AS\s+(?:VARCHAR|STRING)\s*\)",
    re.IGNORECASE,
)


def _render_interval(content: str, qualifier: str) -> str | None:
    """Presto's canonical interval renderings
    (presto-client IntervalYearMonth.formatMonths: '%d-%d';
    IntervalDayTime.formatMillis: '%d %02d:%02d:%02d.%03d')."""
    q = re.sub(r"\s+", " ", qualifier.upper())
    sign = ""
    c = content.strip()
    if c.startswith("-"):
        sign, c = "-", c[1:].strip()
    start = q.split(" ")[0]
    if start in ("YEAR", "MONTH"):
        m = re.fullmatch(r"(\d+)(?:-(\d+))?", c)
        if not m:
            return None
        a, b = int(m.group(1)), int(m.group(2) or 0)
        months = (
            a if q == "MONTH" and m.group(2) is None else a * 12 + b
        )
        return f"{sign}{months // 12}-{months % 12}"
    m = re.fullmatch(
        r"(\d+)(?:[ ](\d+))?(?::(\d+))?(?::(\d+))?(?:\.(\d+))?", c
    )
    if not m:
        return None
    fields = [int(g or 0) for g in m.groups()[:4]]
    frac = (m.group(5) or "").ljust(3, "0")[:3]
    # map the parsed fields onto day/hour/minute/second by start unit
    order = ["DAY", "HOUR", "MINUTE", "SECOND"]
    offset = order.index(start)
    vals = {"DAY": 0, "HOUR": 0, "MINUTE": 0, "SECOND": 0}
    # 'D H:M:S' parses as groups (D, H, M, S); 'H:M:S' as (H, None, M, S)
    parsed = [g for g in [m.group(1), m.group(2), m.group(3), m.group(4)] if g is not None]
    for unit, val in zip(order[offset:], parsed):
        vals[unit] = int(val)
    millis = (
        ((vals["DAY"] * 24 + vals["HOUR"]) * 60 + vals["MINUTE"]) * 60
        + vals["SECOND"]
    ) * 1000 + int(frac)
    day, rem = divmod(millis, 86_400_000)
    hour, rem = divmod(rem, 3_600_000)
    minute, rem = divmod(rem, 60_000)
    second, ms = divmod(rem, 1000)
    return f"{sign}{day} {hour:02d}:{minute:02d}:{second:02d}.{ms:03d}"


def _render_time(t: str) -> str | None:
    m = re.match(r"^(\d{1,2}):(\d{2})(?::(\d{2})(?:\.(\d+))?)?$", t)
    if not m:
        return None
    h, mi, s, f = m.groups()
    return f"{int(h):02d}:{mi}:{s or '00'}.{(f or '').ljust(3, '0')[:3]}"


def _temporal_varchar_sub(literals: list[str]):
    """cast(TIME/TIMESTAMP 'literal' as varchar): Presto renders
    millisecond precision and keeps the literal's zone on the value
    (SqlTime/SqlTimestampWithTimeZone.toString) — statically decidable,
    and the only place the engine's instant-only representation would
    otherwise drop the zone text."""

    def sub(m: re.Match) -> str:
        kind = m.group(1).upper()
        content = literals[int(m.group(2))][1:-1].replace("''", "'").strip()
        parts = content.split()
        zone = None
        if len(parts) >= 2 and (
            re.match(r"^[+-]\d{2}:\d{2}$", parts[-1])
            or re.match(r"^[A-Za-z][\w/+\-]*$", parts[-1])
        ):
            zone = parts[-1]
            parts = parts[:-1]
        if kind == "TIME":
            if len(parts) != 1:
                return m.group(0)
            t = _render_time(parts[0])
            if t is None:
                return m.group(0)
            return f"'{t}{' ' + zone if zone else ''}'"
        dm = re.match(r"^(\d{4})-(\d{1,2})-(\d{1,2})$", parts[0])
        if not dm or len(parts) > 2:
            return m.group(0)
        date = f"{dm.group(1)}-{int(dm.group(2)):02d}-{int(dm.group(3)):02d}"
        t = _render_time(parts[1]) if len(parts) == 2 else "00:00:00.000"
        if t is None:
            return m.group(0)
        return f"'{date} {t}{' ' + zone if zone else ''}'"

    return sub


def _zoned_literal_compat(sql: str, literals: list[str]) -> str:
    sql = _TEMPORAL_VARCHAR.sub(_temporal_varchar_sub(literals), sql)

    def itv_sub(m: re.Match) -> str:
        content = literals[int(m.group(1))][1:-1].replace("''", "'")
        rendered = _render_interval(content, m.group(2))
        if rendered is None:
            return m.group(0)
        literals.append("'" + rendered.replace("'", "''") + "'")
        return f"\x00{len(literals) - 1}\x00"

    sql = _INTERVAL_VARCHAR.sub(itv_sub, sql)

    def time_sub(m: re.Match) -> str:
        content = literals[int(m.group(1))][1:-1].replace("''", "'").strip()
        zm = _TIME_ZONED_CONTENT.match(content)
        if not zm:
            return m.group(0)
        t, zone = zm.groups()
        return (
            f"CAST(date_format(from_utc_timestamp(to_utc_timestamp("
            f"TIMESTAMP '1970-01-01 {t}', '{zone}'), current_timezone()),"
            f" 'HH:mm:ss.SSS') AS TIME)"
        )

    out = _TIME_ZONED.sub(time_sub, sql)
    for m in re.finditer(r"\bTIMESTAMP\s*\x00(\d+)\x00", out, re.IGNORECASE):
        idx = int(m.group(1))
        content = literals[idx][1:-1].replace("''", "'").strip()
        zm = _TS_DATE_ZONE_CONTENT.match(content)
        if zm:
            literals[idx] = f"'{zm.group(1)} 00:00:00 {zm.group(2)}'"
            continue
        # zoned datetime without seconds ('2012-10-31 08:00 UTC'):
        # Spark's literal parser needs the seconds field before a zone id
        zm2 = _TS_ZONED_NO_SECONDS.match(content)
        if zm2:
            literals[idx] = f"'{zm2.group(1)} {zm2.group(2)}:00 {zm2.group(3)}'"
    return out


# --- EXTRACT compatibility (DateTimeFunctions.java extract family) ----------
# Presto extracts local fields of a TIMESTAMP WITH TIME ZONE in the
# VALUE's zone (Spark converts to the session zone first), and allows
# any field over any interval ('247' SECOND → minute 4; Spark rejects
# fields wider than the interval's start unit).  Both are statically
# rewritable for literal arguments.
_EXTRACT_TS = re.compile(
    r"\bextract\s*\(\s*(\w+)\s+FROM\s+TIMESTAMP\s*\x00(\d+)\x00\s*\)",
    re.IGNORECASE,
)
_EXTRACT_ITV = re.compile(
    r"\bextract\s*\(\s*(\w+)\s+FROM\s+"
    r"(INTERVAL\s*\x00\d+\x00\s*(YEAR|MONTH|DAY|HOUR|MINUTE|SECOND))\s*\)",
    re.IGNORECASE,
)
_TS_LOCAL_PART = re.compile(
    # the zone must start with a letter or sign — otherwise a bare time
    # part ('... 03:04:05.321') would be swallowed as a zone
    r"^(\d{4}-\d{2}-\d{2}(?:[ T]\d{2}:\d{2}(?::\d{2}(?:\.\d+)?)?)?)"
    r"\s+([A-Za-z+\-]\S*.*)$"
)


def _extract_compat(sql: str, literals: list[str]) -> str:
    def ts_sub(m: re.Match) -> str:
        field, idx = m.group(1), int(m.group(2))
        if field.lower().startswith("timezone"):
            return m.group(0)
        content = literals[idx][1:-1].replace("''", "'")
        zm = _TS_LOCAL_PART.match(content.strip())
        if not zm:
            return m.group(0)
        literals.append("'" + zm.group(1) + "'")
        return (
            f"extract({field} FROM TIMESTAMP_NTZ \x00{len(literals) - 1}\x00)"
        )

    def itv_sub(m: re.Match) -> str:
        field, itv, unit = m.group(1), m.group(2), m.group(3).upper()
        target = "YEAR TO MONTH" if unit in ("YEAR", "MONTH") else "DAY TO SECOND"
        return f"extract({field} FROM CAST({itv} AS INTERVAL {target}))"

    sql = _EXTRACT_TS.sub(ts_sub, sql)
    return _EXTRACT_ITV.sub(itv_sub, sql)


def _extract_field_rewrite(args: list[str]) -> str | None:
    """Field-level EXTRACT parity (DateTimeFunctions extract family):
    DOW is ISO (Monday=1; Spark's is Sunday-based), SECOND is integral
    (Spark returns decimal seconds), and TIMEZONE_HOUR/MINUTE route to
    the session-zone-aware scalars."""
    if len(args) != 1:
        return None
    m = re.match(r"^\s*(\w+)\s+FROM\s+(.*)$", args[0], re.IGNORECASE | re.DOTALL)
    if not m:
        return None
    field, e = m.group(1).upper(), m.group(2)
    if field == "DOW":
        return f"CAST((dayofweek({e}) + 5) % 7 + 1 AS BIGINT)"
    if field == "SECOND":
        return f"CAST(floor(extract(SECOND FROM {e})) AS BIGINT)"
    if field == "TIMEZONE_HOUR":
        return f"timezone_hour({e})"
    if field == "TIMEZONE_MINUTE":
        return f"timezone_minute({e})"
    return None


_DECIMAL_LIT = re.compile(r"\bDECIMAL\s*'\s*([+-]?[0-9]*\.?[0-9]+)\s*'", re.IGNORECASE)


# Typed literals (grammar SqlBase.g4 typeConstructor): Presto allows
# `TYPE 'literal'` for every type; Spark only for DATE/TIMESTAMP/INTERVAL
# and X''.  Rewrite the rest to CAST; JSON 'x' becomes the bare string
# (the engine's JSON value representation IS the string).
_TYPED_LIT_POST = re.compile(
    r"\b(BIGINT|INTEGER|SMALLINT|TINYINT|DOUBLE\s+PRECISION|DOUBLE|REAL"
    r"|VARCHAR|JSON|CHAR|BOOLEAN|IPADDRESS)\s*(\x00\d+\x00)",
    re.IGNORECASE,
)
_TYPED_LIT_MAP = {
    "bigint": "BIGINT", "integer": "INT", "smallint": "SMALLINT",
    "tinyint": "TINYINT", "double": "DOUBLE", "real": "FLOAT",
    "varchar": "STRING", "double precision": "DOUBLE",
    "boolean": "BOOLEAN",
}


def _canon_json_text(text: str) -> str:
    """Presto's json_parse canonicalization, whitespace half: drop all
    whitespace outside JSON strings (Jackson compact form), preserving
    member order and number lexemes exactly (JsonFunctions.jsonParse —
    values round-trip through Jackson without reformatting)."""
    out: list[str] = []
    i, n = 0, len(text)
    in_str = False
    while i < n:
        ch = text[i]
        if in_str:
            out.append(ch)
            if ch == "\\" and i + 1 < n:
                out.append(text[i + 1])
                i += 2
                continue
            if ch == '"':
                in_str = False
        elif ch == '"':
            in_str = True
            out.append(ch)
        elif ch not in " \t\n\r":
            out.append(ch)
        i += 1
    return "".join(out)


def _typed_literal(m: re.Match, literals: list[str] | None = None) -> str:
    t = re.sub(r"\s+", " ", m.group(1).lower())
    if t == "json":
        # JSON 'x': the engine's JSON representation IS the string, in
        # the reference's canonical (compact) form — rewrite the masked
        # literal in place
        if literals is not None:
            idx = int(m.group(2)[1:-1])
            content = literals[idx][1:-1].replace("''", "'")
            literals[idx] = "'" + _canon_json_text(content).replace("'", "''") + "'"
        return m.group(2)
    if t == "char":
        # CHAR 'x': the literal keeps its own padding (CharType.java) —
        # a plain string literal preserves it exactly.
        return m.group(2)
    if t == "ipaddress":
        return f"__presto_ipaddress({m.group(2)})"
    return f"CAST({m.group(2)} AS {_TYPED_LIT_MAP[t]})"


_TRANSFORM_HEAD = re.compile(r"\btransform\s*\(", re.IGNORECASE)
_FRACTIONAL_ELEM = re.compile(
    r"[-+]?\d*\.\d+(?:[eE][+-]?\d+)?|[-+]?\d+[eE][+-]?\d+"
)


_SCALAR_ELEM = re.compile(r"[-+]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|NULL", re.IGNORECASE)


def _transform_fractional_cast(sql: str) -> str:
    """transform over an all-scalar-literal array: the lambda variable's
    static element type enables two reference-parity rewrites —
    integral casts of a double element ROUND (DoubleOperators), and
    concat(array, x) with a scalar element is array_append
    (ArrayConcatUtils appendElement)."""
    out = sql
    pos = 0
    while True:
        m = _TRANSFORM_HEAD.search(out, pos)
        if not m:
            return out
        end, args = _scan_balanced(out, m.end() - 1)
        if len(args) != 2:
            pos = m.end()
            continue
        arr, lam = args
        am = re.fullmatch(r"\s*array\s*\(([^()]*)\)\s*", arr, re.IGNORECASE)
        lm = re.match(r"\s*(\w+)\s*->", lam)
        if not (am and lm):
            pos = m.end()
            continue
        elems = [e.strip() for e in am.group(1).split(",")]
        if not all(_SCALAR_ELEM.fullmatch(e) for e in elems):
            pos = m.end()
            continue
        p = lm.group(1)
        new_lam = lam
        if all(
            _FRACTIONAL_ELEM.fullmatch(e) for e in elems if e.upper() != "NULL"
        ):
            new_lam = re.sub(
                rf"CAST\s*\(\s*{re.escape(p)}\s+AS\s+"
                r"(BIGINT|INTEGER|INT|SMALLINT|TINYINT)\b",
                rf"CAST(round({p}) AS \1",
                new_lam,
                flags=re.IGNORECASE,
            )
        new_lam = re.sub(
            rf"\bconcat\s*\(\s*(array\s*\([^()]*\))\s*,\s*{re.escape(p)}\s*\)",
            rf"(CASE WHEN {p} IS NULL THEN NULL"
            rf" ELSE array_append(\1, {p}) END)",
            new_lam,
            flags=re.IGNORECASE,
        )
        if new_lam == lam:
            pos = m.end()
            continue
        repl = f"transform({arr}, {new_lam})"
        out = out[: m.start()] + repl + out[end:]
        pos = m.start() + len(repl)


def _map_zip_with_int_div(literals: list[str]):
    """map_zip_with over maps with statically-integer literal values:
    division between the two value lambda-parameters is Presto integer
    division (the value types are INTEGER), not ANSI double division."""

    def fn(args: list[str]) -> str | None:
        if len(args) != 3:
            return None
        from prestodb_presto_spark.functions import json_static

        def int_valued(text: str) -> bool:
            try:
                node = json_static.parse_literal_expr(text.strip(), literals)
            except Exception:
                return False
            return (
                node is not None
                and node[0] == "map"
                and all(v[0] == "int" for _, v in node[1])
            )

        if not (int_valued(args[0]) and int_valued(args[1])):
            return None
        lm = re.match(
            r"^\s*\(\s*(\w+)\s*,\s*(\w+)\s*,\s*(\w+)\s*\)\s*->", args[2]
        )
        if not lm:
            return None
        v1, v2 = lm.group(2), lm.group(3)
        body = re.sub(
            rf"\b({re.escape(v1)}|{re.escape(v2)})\s*/\s*"
            rf"({re.escape(v1)}|{re.escape(v2)})\b",
            r"(\1 DIV \2)",
            args[2],
        )
        if body == args[2]:
            return None
        return f"map_zip_with({args[0]}, {args[1]}, {body})"

    return fn


def _split_rewrite(args: list[str]) -> str | None:
    """Presto split(s, delim[, limit]) treats the delimiter as a LITERAL
    string (StringFunctions.split); Spark's split is regex — quote it.
    Limit semantics agree (last element carries the rest, trailing
    empties kept)."""
    if len(args) == 2:
        return f"split({args[0]}, concat('\\Q', {args[1]}, '\\E'), -1)"
    if len(args) == 3:
        return f"split({args[0]}, concat('\\Q', {args[1]}, '\\E'), {args[2]})"
    return None


def _regexp_split_rewrite(literals: list[str]):
    """regexp_split(s, pattern) — Spark's split IS regex; -1 keeps the
    trailing empty fields Presto keeps (RegexpFunctions.regexpSplit).
    Joni splits on the empty pattern at EVERY boundary including both
    ends.  Runs AFTER the literal-delimiter split rewrite so its
    emission is not re-quoted."""

    def fn(args: list[str]) -> str | None:
        if len(args) != 2:
            return None
        lm = re.fullmatch(r"\x00(\d+)\x00", args[1].strip())
        if lm and literals[int(lm.group(1))] == "''":
            return (
                f"concat(array(''), split({args[0]}, ''), array(''))"
            )
        return f"split({args[0]}, {args[1]}, -1)"

    return fn


def _map_entries_mapkey_rewrite(args: list[str]) -> str | None:
    """map_entries over a literal constructor whose KEYS are maps:
    Spark forbids map-typed map keys entirely, but the map here exists
    only to be exploded — fold straight to the entry array
    (MapEntriesFunction semantics)."""
    if len(args) != 1:
        return None
    a = args[0].strip()
    m = re.match(r"^map(?:_from_arrays)?\s*\(", a, re.IGNORECASE)
    if not m or not a.endswith(")"):
        return None
    try:
        end, margs = _scan_balanced(a, m.end() - 1)
    except ValueError:
        return None
    if end != len(a) or len(margs) != 2:
        return None
    k_txt, v_txt = margs[0].strip(), margs[1].strip()
    km = re.match(r"^array\s*\(", k_txt, re.IGNORECASE)
    vm = re.match(r"^array\s*\(", v_txt, re.IGNORECASE)
    if not (km and vm):
        return None
    try:
        _, ks = _scan_balanced(k_txt, km.end() - 1)
        _, vs = _scan_balanced(v_txt, vm.end() - 1)
    except ValueError:
        return None
    if len(ks) != len(vs) or not ks:
        return None
    if not re.match(r"^\s*map", ks[0], re.IGNORECASE):
        return None  # ordinary keys: Spark's native map_entries is fine
    entries = ", ".join(
        f"named_struct('key', {k}, 'value', {v})" for k, v in zip(ks, vs)
    )
    return f"array({entries})"


def _map_from_entries_edge_rewrite(args: list[str]) -> str | None:
    """map_from_entries(NULL) is NULL and the empty array yields the
    empty map (MapFromEntriesFunction); Spark cannot type either."""
    if len(args) != 1:
        return None
    a = args[0].strip()
    if a.upper() == "NULL":
        return "CAST(NULL AS MAP<STRING, STRING>)"
    if re.fullmatch(r"array\s*\(\s*\)", a, re.IGNORECASE):
        return "map()"
    return None


def _map_concat_null_rewrite(args: list[str]) -> str | None:
    """map_concat with a NULL argument is NULL (MapConcatFunction)."""
    if len(args) >= 2 and any(x.strip().upper() == "NULL" for x in args):
        return "CAST(NULL AS MAP<STRING, STRING>)"
    return None


def _multimap_from_entries_rewrite(args: list[str]) -> str | None:
    """multimap_from_entries over a literal array of (k, v) tuples —
    grouped statically, preserving entry order per key
    (MultimapFromEntriesFunction)."""
    if len(args) != 1:
        return None
    a = args[0].strip()
    if a.upper() == "NULL":
        return "CAST(NULL AS MAP<STRING, ARRAY<STRING>>)"
    if re.fullmatch(r"array\s*\(\s*\)", a, re.IGNORECASE) or re.match(
        r"^(?:TRY_)?CAST\s*\(\s*array\s*\(\s*\)", a, re.IGNORECASE
    ):
        return "map()"
    m = re.match(r"^array\s*\(", a, re.IGNORECASE)
    if not m:
        return None
    try:
        end, items = _scan_balanced(a, m.end() - 1)
    except ValueError:
        return None
    if end != len(a):
        return None
    pairs: list[tuple[str, str]] = []
    for it in items:
        t = it.strip()
        if not (t.startswith("(") and t.endswith(")")):
            return None
        try:
            tend, kv = _scan_balanced(t, 0)
        except ValueError:
            return None
        if tend != len(t) or len(kv) != 2:
            return None
        pairs.append((kv[0].strip(), kv[1].strip()))
    keys: list[str] = []
    groups: dict[str, list[str]] = {}
    for k, v in pairs:
        if k not in groups:
            keys.append(k)
            groups[k] = []
        groups[k].append(v)
    ks = ", ".join(keys)
    vs = ", ".join(f"array({', '.join(groups[k])})" for k in keys)
    return f"map_from_arrays(array({ks}), array({vs}))"


def _split_to_map_rewrite(args: list[str]) -> str | None:
    """split_to_map(s, entryDelim, kvDelim) (StringFunctions.splitToMap)
    → Spark str_to_map with regex-quoted literal delimiters; Presto
    returns the empty map for empty input and '' (not NULL) for an
    entry whose value is empty."""
    if len(args) != 3:
        return None
    s, d1, d2 = args
    m = (
        f"transform_values(str_to_map({s}, concat('\\Q', {d1}, '\\E'),"
        f" concat('\\Q', {d2}, '\\E')), (__k, __v) -> coalesce(__v, ''))"
    )
    return f"(CASE WHEN length({s}) = 0 THEN map() ELSE {m} END)"


def _split_to_multimap_rewrite(args: list[str]) -> str | None:
    """split_to_multimap keeps every value per key, in entry order
    (StringFunctions.splitToMultimap)."""
    if len(args) != 3:
        return None
    s, d1, d2 = args
    entries = f"split({s}, concat('\\Q', {d1}, '\\E'), -1)"
    key = f"substr(__e, 1, locate({d2}, __e) - 1)"
    val = f"substr(__e, locate({d2}, __e) + length({d2}))"
    keys = f"array_distinct(transform({entries}, __e -> {key}))"
    vals = (
        f"transform({keys}, __k -> transform("
        f"filter({entries}, __e -> {key} = __k),"
        f" __e -> {val}))"
    )
    return (
        f"(CASE WHEN length({s}) = 0 THEN map()"
        f" ELSE map_from_arrays({keys}, {vals}) END)"
    )


def _cosine_sim_map_rewrite(args: list[str]) -> str | None:
    """Reference cosine_similarity is over sparse MAP(varchar, double)
    vectors (MathFunctions.cosineSimilarity).  Fires when an argument is
    textually a map constructor; NULL maps / NULL values propagate NULL
    through the aggregates naturally."""
    if len(args) != 2:
        return None
    a, b = args[0].strip(), args[1].strip()

    def mapish(x: str) -> bool:
        return bool(
            re.match(r"^map(?:_from_arrays)?\s*\(", x, re.IGNORECASE)
        )

    if not (mapish(a) or mapish(b)):
        return None
    if a.upper() == "NULL":
        a = "CAST(NULL AS MAP<STRING, DOUBLE>)"
    if b.upper() == "NULL":
        b = "CAST(NULL AS MAP<STRING, DOUBLE>)"
    dot = (
        f"aggregate(map_keys({a}), CAST(0 AS DOUBLE), (__acc, __k) ->"
        f" __acc + coalesce(element_at({a}, __k), 0D)"
        f" * coalesce(element_at({b}, __k), 0D))"
    )
    na = (
        f"sqrt(aggregate(map_values({a}), CAST(0 AS DOUBLE),"
        f" (__acc, __v) -> __acc + __v * __v))"
    )
    nb = (
        f"sqrt(aggregate(map_values({b}), CAST(0 AS DOUBLE),"
        f" (__acc, __v) -> __acc + __v * __v))"
    )
    return f"({dot} / ({na} * {nb}))"


def _if2_rewrite(args: list[str]) -> str | None:
    """Presto allows if(cond, trueVal) with an implicit NULL else branch
    (presto-parser SqlBase.g4 / ConditionalFunctions); Spark's IF is
    strictly ternary."""
    if len(args) == 2:
        return f"IF({args[0]}, {args[1]}, NULL)"
    return None


def _truncate_rewrite(args: list[str]) -> str | None:
    x = args[0]
    if len(args) == 1:
        return f"(CAST(sign({x}) AS DOUBLE) * floor(abs({x})))"
    n = args[1]
    return (
        f"(CAST(sign({x}) AS DOUBLE) * floor(abs({x}) * power(10, {n}))"
        f" / power(10, {n}))"
    )


def _bit_count_rewrite(args: list[str]) -> str | None:
    if len(args) == 1:
        return None  # native bit_count
    a, bits = args
    if bits.strip() == "64":
        return f"bit_count({a})"
    # two's-complement view of the low `bits`: mask keeps the bit pattern
    return f"bit_count({a} & (shiftleft(CAST(1 AS BIGINT), {bits}) - 1))"


def _replace_rewrite(args: list[str]) -> str | None:
    if len(args) != 3:
        return None
    a, b, r = args
    # Presto REPLACE('abc','','x') interleaves the replacement around
    # every character (StringFunctions.replace); Spark returns the input
    return (
        f"(CASE WHEN ({b}) = '' THEN"
        f" (CASE WHEN ({a}) = '' THEN ({r}) ELSE"
        f" concat({r}, array_join(transform(split({a}, ''), __ch -> concat(__ch, {r})), '')) END)"
        f" ELSE replace({a}, {b}, {r}) END)"
    )


def _chr_rewrite(args: list[str]) -> str | None:
    # Presto chr = full Unicode code point; Spark's chr is mod-256 ASCII.
    # Java's %c takes a code point directly (supplementary planes incl.).
    return f"format_string('%c', CAST({args[0]} AS INT))"


def _is_json_scalar_rewrite(args: list[str]) -> str | None:
    j = args[0]
    # literals parse in raw mode (engine._presto_literals): emit single
    # backslashes — the regex gets them verbatim
    pat = r"^(\"(?:[^\"\\]|\\.)*\"|-?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?|true|false|null)$"
    return f"(CASE WHEN ({j}) IS NULL THEN NULL ELSE trim({j}) RLIKE '{pat}' END)"


def _word_stem_rewrite(args: list[str]) -> str | None:
    # session-registered pandas UDF (sql_support.ensure_sql_support):
    # Snowball English (porter2.py) for 'en', suffix heuristic otherwise
    a = args[0]
    lang = args[1] if len(args) > 1 else "'en'"
    return f"__presto_word_stem({a}, {lang})"


def _greatest_least_rewrite(name: str):
    """Presto greatest/least return NULL if ANY argument is NULL
    (GreatestFunction.java); Spark's skip NULLs.  Single-argument form
    is the identity."""

    def fn(args: list[str]) -> str | None:
        if len(args) == 1:
            return f"({args[0]})"
        nulls = " OR ".join(f"({a}) IS NULL" for a in args)
        return f"(CASE WHEN {nulls} THEN NULL ELSE {name}({', '.join(args)}) END)"

    return fn


def _substr_rewrite(args: list[str]) -> str | None:
    """Presto substr: position 0 or beyond-negative yields '' (Spark
    clamps to the full string).  Handles both substr(s, p[, n]) and
    SUBSTRING(s FROM p [FOR n])."""
    if len(args) == 1:
        m = re.match(
            r"(?s)^(.*?)\s+from\s+(.+?)(?:\s+for\s+(.+))?$", args[0], re.IGNORECASE
        )
        if not m:
            return None
        s, p, n = m.groups()
        args = [s, p] + ([n] if n else [])
    if len(args) not in (2, 3):
        return None
    s, p = args[0], args[1]
    rest = f", {args[2]}" if len(args) == 3 else ""
    return (
        f"(CASE WHEN ({p}) = 0 OR ({p}) < -length({s}) THEN ''"
        f" ELSE substr({s}, {p}{rest}) END)"
    )


def _json_array_contains_rewrite(args: list[str]) -> str | None:
    """json_array_contains(json, value) (JsonFunctions.java): type-aware
    membership in a top-level JSON array.  Spark 4's VARIANT keeps JSON
    type fidelity ("true" vs true) but normalizes number lexemes
    (1.0 → 1), while the reference matches a BIGINT search value only
    against integral number tokens.  So elements are checked two ways:
    the variant rendering pins the TYPE (string vs number vs bool) and
    the raw get_json_object text pins the LEXICAL form (the raw check is
    skipped for fractional/exponent search values, which legitimately
    render with . or e)."""
    if len(args) != 2:
        return None
    j, v = args
    if re.fullmatch(r"\x00\d+\x00", v.strip()):
        cond = f"__vj = concat('\"', {v}, '\"')"
    else:
        tgt = f"CAST(({v}) AS STRING)"
        cond = (
            f"__vj = {tgt} AND (NOT __raw RLIKE '[.eE]' OR {tgt} RLIKE '[.eE]')"
        )
    varr = f"from_json({j}, 'array<variant>')"
    raws = (
        f"transform((CASE WHEN size({varr}) >= 1 THEN sequence(1, size({varr}))"
        f" ELSE array() END),"
        f" __i -> get_json_object({j}, concat('$[', CAST(__i - 1 AS STRING), ']')))"
    )
    return (
        f"(CASE WHEN ({v}) IS NULL THEN NULL ELSE"
        f" exists(zip_with(transform({varr}, __v -> to_json(__v)), {raws},"
        f" (__vj, __raw) -> {cond}), __b -> __b) END)"
    )


def _json_array_get_rewrite(args: list[str]) -> str | None:
    """json_array_get(json, index) (JsonFunctions.jsonArrayGet):
    element at index as JSON text — negative index counts from the end,
    out-of-range/malformed/JSON-null yield NULL, string elements render
    unquoted (the reference's own documented quirk, which
    get_json_object shares).  nullif(.., 'null') conflates a JSON null
    element with the string "null" — no reference case distinguishes."""
    if len(args) != 2:
        return None
    j, i = args
    n = f"json_array_length({j})"
    eff = f"(CASE WHEN ({i}) < 0 THEN {n} + ({i}) ELSE ({i}) END)"
    return (
        f"(CASE WHEN {eff} >= 0 AND {eff} < {n} THEN"
        f" nullif(get_json_object({j},"
        f" concat('$[', CAST({eff} AS STRING), ']')), 'null') END)"
    )


def _width_bucket_rewrite(args: list[str]) -> str | None:
    """width_bucket(x, bins_array) overload (MathFunctions.java):
    1-based index = count of bin boundaries <= x."""
    if len(args) != 2:
        return None
    return f"size(filter({args[1]}, __b -> __b <= ({args[0]})))"


def _split_part_rewrite(args: list[str]) -> str | None:
    """Presto split_part: out-of-range index yields NULL (Spark ''),
    empty delimiter splits per character, index 0 yields ''."""
    if len(args) != 3:
        return None
    s, d, i = args
    return (
        f"(CASE WHEN ({d}) = '' THEN"
        f" (CASE WHEN ({i}) <= length({s}) THEN substr({s}, {i}, 1) END)"
        f" WHEN ({i}) = 0 THEN ''"
        f" WHEN ({i}) > size(split({s}, concat('\\Q', {d}, '\\E'))) THEN NULL"
        f" ELSE split_part({s}, {d}, {i}) END)"
    )


# Java Character.isWhitespace code points — airlift SliceUtf8.trim's set
# (what StringFunctions.trim strips): control whitespace + Unicode space
# separators minus the non-breaking ones (00A0, 2007, 202F).
_PRESTO_WS = "".join(
    chr(c)
    for c in (
        [0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20, 0x1680]
        + list(range(0x2000, 0x2007))
        + list(range(0x2008, 0x200B))
        + [0x2028, 0x2029, 0x205F, 0x3000]
    )
)


def _trim2_rewrite(side: str):
    """Presto ltrim/rtrim(string, chars): Spark's 2-arg spelling reverses
    the arguments — use the unambiguous TRIM(LEADING/TRAILING x FROM y).
    The 1-arg form strips the reference's full Unicode whitespace set
    (SliceUtf8.trim), not just ASCII space like Spark's."""

    def fn(args: list[str]) -> str | None:
        if len(args) == 1:
            if re.match(r"(?is)^\s*(LEADING|TRAILING|BOTH)\b", args[0]):
                return None  # already the standard TRIM(side .. FROM ..) form
            return f"TRIM({side} '{_PRESTO_WS}' FROM {args[0]})"
        if len(args) != 2:
            return None
        return f"TRIM({side} {args[1]} FROM {args[0]})"

    return fn


def _normalize_rewrite(args: list[str]) -> str | None:
    """normalize(s[, form]) (StringFunctions.normalize): Unicode
    normalization via the session pandas UDF — java.text.Normalizer has
    no reflect()-reachable string-keyed overload.  The form is a bare
    keyword in the reference grammar."""
    if len(args) == 1:
        return f"__presto_normalize({args[0]}, 'NFC')"
    if len(args) == 2:
        form = args[1].strip().upper()
        if re.fullmatch(r"NFK?[CD]", form):
            return f"__presto_normalize({args[0]}, '{form}')"
    return None


def _from_utf8_rewrite(args: list[str]) -> str | None:
    """from_utf8(bin[, repl]) (StringFunctions.fromUtf8): invalid UTF-8
    replaced with U+FFFD or the custom replacement (string literal or
    codepoint)."""
    if len(args) == 1:
        return f"__presto_from_utf8({args[0]}, '�')"
    if len(args) == 2:
        r = args[1].strip()
        if re.fullmatch(r"\x00\d+\x00", r):
            return f"__presto_from_utf8({args[0]}, {r})"
        return (
            f"__presto_from_utf8({args[0]},"
            f" format_string('%c', CAST({r} AS INT)))"
        )
    return None


_LAMBDA_ARG = re.compile(r"^\s*(\w+)\s*->\s*(.+)$", re.DOTALL)


def _capture_group_numbers(pattern: str) -> dict[str, int]:
    """name → group number for every ``(?<name>..)`` in a regex, counting
    all capture groups ((?:..), (?=..), (?<=..) etc. don't count)."""
    names: dict[str, int] = {}
    num = 0
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        ch = pattern[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
            i += 1
            continue
        if ch == "[":
            in_class = True
            i += 1
            continue
        if ch == "(":
            if i + 1 < n and pattern[i + 1] == "?":
                m = re.match(r"\(\?<([A-Za-z][A-Za-z0-9]*)>", pattern[i:])
                if m:  # named capture counts; other (?..) groups don't
                    num += 1
                    names[m.group(1)] = num
            else:
                num += 1
        i += 1
    return names


def _regexp_named_refs_rewrite(args: list[str]) -> str | None:
    """``${name}`` group references in a literal replacement → ``$N``
    (JoniRegexpFunctions.regexpReplace resolves names; Spark's
    regexp_replace only knows numeric references).  Runs pre-masking —
    it must read both literals."""
    if len(args) != 3:
        return None
    p_m = re.fullmatch(_LIT, args[1].strip())
    r_m = re.fullmatch(_LIT, args[2].strip())
    if not p_m or not r_m or "${" not in args[2]:
        return None
    pattern = args[1].strip()[1:-1].replace("''", "'")
    repl = args[2].strip()[1:-1]
    names = _capture_group_numbers(pattern)

    def sub(m: re.Match) -> str:
        g = names.get(m.group(1))
        return f"${g}" if g is not None else m.group(0)

    new_repl = re.sub(r"\$\{([A-Za-z][A-Za-z0-9]*)\}", sub, repl)
    if new_repl == repl:
        return None
    return f"regexp_replace({args[0]}, {args[1]}, '{new_repl}')"


def _regexp_replace_rewrite(args: list[str]) -> str | None:
    """2-arg deletion form, plus the replace-with-lambda overload
    (JoniRegexpReplaceLambdaFunction.java): ``regexp_replace(s, p,
    x -> body)``.  The match decomposition comes from the
    ``__presto_regexp_parts`` UDF (functions/regexp_fns.ensure_sql_support);
    the lambda body itself runs as a native zip_with over (groups,
    following-segment) pairs, `||`-concatenated so a NULL replacement
    nulls the entire result — the reference's documented semantics.
    The grps rows lead with the full match, so Presto's 1-based x[i]
    lands on group i via Spark's 0-based array indexing."""
    if len(args) == 2:
        return f"regexp_replace({args[0]}, {args[1]}, '')"
    if len(args) != 3:
        return None
    m = _LAMBDA_ARG.match(args[2])
    if not m:
        return None  # plain string replacement is native
    var, body = m.groups()
    # resolve the lambda's 1-based group refs here (grps leads with the
    # full match, so Presto's x[i] is grps' 0-based i = element_at i+1)
    # — the generic 1-based _subscript_compat must not re-shift them
    body = re.sub(
        rf"\b{re.escape(var)}\s*\[([^\[\]]+)\]",
        rf"element_at({var}, (\1) + 1)",
        body,
    )
    s, p = args[0], args[1]
    return (
        f"element_at(transform(array(__presto_regexp_parts({s}, {p})), __pp -> "
        f"element_at(__pp.segs, 1) || aggregate("
        f"zip_with(__pp.grps, slice(__pp.segs, 2, size(__pp.grps)), "
        f"({var}, __sg) -> ({body}) || __sg), "
        f"'', (__acc, __v) -> __acc || __v)), 1)"
    )


def _regexp_extract_rewrite(args: list[str]) -> str | None:
    """Presto regexp_extract: 2-arg returns the FULL match (Spark
    defaults to group 1) and no-match yields NULL (Spark '').  The
    3-arg form additionally maps a non-participating group to NULL
    (JoniRegexpFunctions.regexpExtract returns null when
    matcher.group(g) is absent); nullif conflates a participating
    empty group with absent — documented approximation, no reference
    case distinguishes them."""
    if len(args) == 2:
        s, p = args
        return f"(CASE WHEN ({s}) RLIKE ({p}) THEN regexp_extract({s}, {p}, 0) END)"
    if len(args) == 3:
        s, p, g = args
        return (
            f"(CASE WHEN ({s}) RLIKE ({p})"
            f" THEN nullif(regexp_extract({s}, {p}, {g}), '') END)"
        )
    return None


def _regexp_extract_all_rewrite(args: list[str]) -> str | None:
    """Same group-0 default; 3-arg maps non-participating groups to
    NULL per element (reference nullList cases)."""
    if len(args) == 2:
        return f"regexp_extract_all({args[0]}, {args[1]}, 0)"
    if len(args) == 3:
        s, p, g = args
        return (
            f"transform(regexp_extract_all({s}, {p}, {g}),"
            f" __m -> nullif(__m, ''))"
        )
    return None


# simple call templates: presto name -> python format with {a} placeholders
_SQL_TEMPLATES = {
    "to_base64": "base64({0})",
    "from_base64": "unbase64({0})",
    "to_base64url": "translate(base64({0}), '+/', '-_')",
    "from_base64url": "unbase64(translate({0}, '-_', '+/'))",
    "to_hex": "upper(hex({0}))",
    "from_hex": "unhex({0})",
    # UrlFunctions.urlExtractParameter: FIRST occurrence wins and a
    # valueless key ('...&k3&...') returns '' (Spark's parse_url
    # key-lookup returns NULL for both); scan the query params in order
    "url_extract_parameter":
        "(CASE WHEN try_element_at(filter(split(parse_url({0}, 'QUERY'), '&'),"
        " p -> split_part(p, '=', 1) = {1}), 1) IS NULL THEN NULL"
        " WHEN locate('=', try_element_at(filter(split(parse_url({0}, 'QUERY'),"
        " '&'), p -> split_part(p, '=', 1) = {1}), 1)) = 0 THEN ''"
        " ELSE substring(try_element_at(filter(split(parse_url({0}, 'QUERY'),"
        " '&'), p -> split_part(p, '=', 1) = {1}), 1),"
        " locate('=', try_element_at(filter(split(parse_url({0}, 'QUERY'),"
        " '&'), p -> split_part(p, '=', 1) = {1}), 1)) + 1) END)",
    # (typeof handled by _typeof_spelling_compat below — a context-aware
    # pass so its own expansion's inner typeof is not re-expanded on
    # re-translation, keeping translate() idempotent)
    "year_of_week": "extract(YEAROFWEEK FROM {0})",
    "yow": "extract(YEAROFWEEK FROM {0})",
    "bitwise_and": "(({0}) & ({1}))",
    "bitwise_or": "(({0}) | ({1}))",
    "bitwise_xor": "(({0}) ^ ({1}))",
    "bitwise_not": "(~({0}))",
    "infinity": "CAST('Infinity' AS DOUBLE)",
    "nan": "CAST('NaN' AS DOUBLE)",
    "to_utf8": "encode({0}, 'UTF-8')",
    "hamming_distance":
        "(CASE WHEN length({0}) <> length({1})"
        " THEN CAST(raise_error('the input strings must have the same length') AS BIGINT)"
        " ELSE CAST(size(filter(zip_with(split({0}, ''), split({1}, ''),"
        " (__x, __y) -> __x <> __y), __t -> __t)) AS BIGINT) END)",
    "to_base":
        "(CASE WHEN ({0}) < 0 THEN concat('-', lower(conv(-({0}), 10, {1})))"
        " ELSE lower(conv({0}, 10, {1})) END)",
    "from_base":
        "(CASE WHEN substr({0}, 1, 1) = '-'"
        " THEN CAST(CAST(conv(substr({0}, 2), {1}, 10) AS DECIMAL(20,0)) * -1 AS BIGINT)"
        " ELSE CAST(conv({0}, {1}, 10) AS BIGINT) END)",
    "codepoint": "ascii({0})",
    # presto-teradata-functions (TeradataStringFunctions.java): INDEX is
    # 1-based locate (0 = absent); CHAR2HEXINT is the UTF-16BE hex of
    # the string, uppercase
    "index": "CAST(locate({1}, {0}) AS BIGINT)",
    "char2hexint": "upper(hex(encode({0}, 'UTF-16BE')))",
    # arbitrary skips NULLs (ArbitraryAggregationFunction @SqlNullable
    # combine keeps the first non-null); Spark any_value defaults to
    # respecting them
    "arbitrary": "any_value({0}, true)",
    # (checksum routes through _parity_agg_compat: the bit-exact
    # ChecksumAggregationFunction parity UDAF when unmixed, else the
    # documented md5-XOR convention — _native_checksum)
    # the reference test harness's custom scalar functions — semantics
    # from their sources (presto-main test CustomFunctions.java,
    # TestIsNullAnnotation.java): custom_add, IS NULL probes, and the
    # @IsNull-annotation concat (a null non-@SqlNullable arg => NULL)
    # ArrayFunctions.java: array_min/max return NULL when ANY element
    # is NULL (Spark's skip nulls)
    "array_min":
        "(CASE WHEN exists({0}, __e -> __e IS NULL) THEN NULL"
        " ELSE array_min({0}) END)",
    "array_max":
        "(CASE WHEN exists({0}, __e -> __e IS NULL) THEN NULL"
        " ELSE array_max({0}) END)",
    "custom_add": "(CAST({0} AS BIGINT) + CAST({1} AS BIGINT))",
    # TestInstanceFunction.java:40 (precomputed → 42),
    # TestBlockAndPositionNullConvention.java (identityFunction),
    # TestUnknownOperators.java:39 (null_function → unknown NULL)
    "identityFunction": "CAST({0} AS BIGINT)",
    "precomputed": "CAST(42 AS BIGINT)",
    "null_function": "NULL",
    "custom_is_null": "(({0}) IS NULL)",
    "test_is_null_simple": "(CASE WHEN ({0}) IS NULL THEN 100 ELSE 2 * ({0}) END)",
    "test_is_null":
        "(CASE WHEN ({1}) IS NULL THEN NULL ELSE"
        " concat(coalesce(CAST({0} AS STRING), ''), ':', {1}, ':',"
        " coalesce({2}, ''), ':', coalesce({3}, '')) END)",
    "test_is_null_void": "(({0}) IS NULL)",
    # duration scalars (DateTimeFunctions.parseDuration, airlift
    # Duration units ns/us/ms/s/m/h/d): the engine's interval scalar
    # representation is seconds as DOUBLE (datetime_fns.parse_duration)
    "parse_duration":
        "(CAST(regexp_extract({0}, '^\\s*([0-9]*\\.?[0-9]+)\\s*([a-z]+)\\s*$', 1)"
        " AS DOUBLE)"
        " * CASE regexp_extract({0}, '^\\s*([0-9]*\\.?[0-9]+)\\s*([a-z]+)\\s*$', 2)"
        " WHEN 'ns' THEN 1e-9 WHEN 'us' THEN 1e-6 WHEN 'ms' THEN 1e-3"
        " WHEN 's' THEN 1e0 WHEN 'm' THEN 6e1 WHEN 'h' THEN 36e2"
        " WHEN 'd' THEN 864e2 END)",
    "to_milliseconds": "CAST(CAST({0} AS DOUBLE) * 1000 AS BIGINT)",
    # statistical scalars (MathFunctions.java normalCdf/inverseNormalCdf
    # use commons-math3 Erf — the same library Spark ships, reached via
    # reflect, so values are bit-exact; wilson* is pure arithmetic)
    "normal_cdf":
        "(0.5 * (1 + CAST(reflect('org.apache.commons.math3.special.Erf',"
        " 'erf', CAST((CAST({2} AS DOUBLE) - CAST({0} AS DOUBLE))"
        " / (CAST({1} AS DOUBLE) * 1.4142135623730951) AS DOUBLE))"
        " AS DOUBLE)))",
    "inverse_normal_cdf":
        "(CAST({0} AS DOUBLE) + CAST({1} AS DOUBLE) * 1.4142135623730951"
        " * CAST(reflect('org.apache.commons.math3.special.Erf', 'erfInv',"
        " CAST(2 * CAST({2} AS DOUBLE) - 1 AS DOUBLE)) AS DOUBLE))",
    "wilson_interval_lower":
        "(((CAST({0} AS DOUBLE)/CAST({1} AS DOUBLE))"
        " + ({2})*({2})/(2*CAST({1} AS DOUBLE))"
        " - ({2}) * sqrt((CAST({0} AS DOUBLE)/CAST({1} AS DOUBLE))"
        "   * (1 - CAST({0} AS DOUBLE)/CAST({1} AS DOUBLE))/CAST({1} AS DOUBLE)"
        "   + ({2})*({2})/(4.0*CAST({1} AS DOUBLE)*CAST({1} AS DOUBLE))))"
        " / (1 + ({2})*({2})/CAST({1} AS DOUBLE)))",
    "wilson_interval_upper":
        "(((CAST({0} AS DOUBLE)/CAST({1} AS DOUBLE))"
        " + ({2})*({2})/(2*CAST({1} AS DOUBLE))"
        " + ({2}) * sqrt((CAST({0} AS DOUBLE)/CAST({1} AS DOUBLE))"
        "   * (1 - CAST({0} AS DOUBLE)/CAST({1} AS DOUBLE))/CAST({1} AS DOUBLE)"
        "   + ({2})*({2})/(4.0*CAST({1} AS DOUBLE)*CAST({1} AS DOUBLE))))"
        " / (1 + ({2})*({2})/CAST({1} AS DOUBLE)))",
    # reference test-harness varbinary→varchar helper (TestJsonExtract)
    "utf8": "decode({0}, 'UTF-8')",
    "is_infinite": "(CASE WHEN {0} IS NULL THEN NULL ELSE"
                   " abs(CAST({0} AS DOUBLE)) = CAST('Infinity' AS DOUBLE) END)",
    "is_nan": "(CASE WHEN {0} IS NULL THEN NULL ELSE isnan(CAST({0} AS DOUBLE)) END)",
    "is_finite": "(CASE WHEN {0} IS NULL THEN NULL ELSE NOT isnan(CAST({0} AS DOUBLE))"
                 " AND abs(CAST({0} AS DOUBLE)) <> CAST('Infinity' AS DOUBLE) END)",
    # endian/IEEE754 casts (reference VarbinaryFunctions.java): signed
    # radix tricks via conv; bit<->float through the JVM's own converters
    "from_big_endian_64": "CAST(conv(hex({0}), 16, -10) AS BIGINT)",
    "to_big_endian_64": "unhex(lpad(conv({0}, 10, 16), 16, '0'))",
    "from_big_endian_32":
        "CAST(CAST(conv(hex({0}), 16, 10) AS BIGINT)"
        " - (CASE WHEN CAST(conv(hex({0}), 16, 10) AS BIGINT) >= 2147483648"
        " THEN 4294967296 ELSE 0 END) AS INT)",
    "to_big_endian_32": "unhex(lpad(conv(CAST({0} AS BIGINT) & 4294967295, 10, 16), 8, '0'))",
    "from_ieee754_64":
        "CAST(reflect('java.lang.Double', 'longBitsToDouble',"
        " CAST(conv(hex({0}), 16, -10) AS BIGINT)) AS DOUBLE)",
    "to_ieee754_64":
        "unhex(lpad(conv(reflect('java.lang.Double', 'doubleToRawLongBits',"
        " CAST({0} AS DOUBLE)), 10, 16), 16, '0'))",
    "from_ieee754_32":
        "CAST(reflect('java.lang.Float', 'intBitsToFloat',"
        " CAST(CAST(conv(hex({0}), 16, 10) AS BIGINT)"
        " - (CASE WHEN CAST(conv(hex({0}), 16, 10) AS BIGINT) >= 2147483648"
        " THEN 4294967296 ELSE 0 END) AS INT)) AS FLOAT)",
    "to_ieee754_32":
        "unhex(lpad(conv(CAST(reflect('java.lang.Float', 'floatToRawIntBits',"
        " CAST({0} AS FLOAT)) AS BIGINT) & 4294967295, 10, 16), 8, '0'))",
}


def _template_rewrite(tpl: str):
    def fn(args: list[str]) -> str | None:
        try:
            return tpl.format(*args)
        except IndexError:
            return None

    return fn


# presto-ml SQL surface (MLFunctions.java: features/learn_classifier/
# classify).  The reference trains a libsvm SVM; the SQL path here keeps
# the model as the collected training set and classifies 1-NN — a
# documented deviation (ml.py holds the DataFrame-level API) that agrees
# with the reference's own product-test cases (single-example training).
def _features_rewrite(args: list[str]) -> str | None:
    cast = ", ".join(f"CAST({a} AS DOUBLE)" for a in args)
    return f"array({cast})"


def _learn_classifier_rewrite(args: list[str]) -> str | None:
    label, feats = args[0], args[1]
    return f"collect_list(named_struct('label', {label}, 'feats', {feats}))"


def _classify_rewrite(args: list[str]) -> str | None:
    f, m = args[0], args[1]
    dist = (
        "aggregate(zip_with({v}.feats, " + f
        + ", (x, y) -> (x - y) * (x - y)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    da, db = dist.format(v="a"), dist.format(v="b")
    return (
        f"element_at(array_sort({m}, (a, b) -> CASE WHEN {da} < {db} THEN -1"
        f" WHEN {da} > {db} THEN 1 ELSE 0 END), 1).label"
    )


def _random_rewrite(args: list[str]) -> str | None:
    if len(args) != 1 or not args[0]:
        return None  # zero-arg random() is native
    return f"CAST(FLOOR(rand() * ({args[0]})) AS BIGINT)"


# `<expr> AT TIME ZONE 'Z'` (grammar SqlBase.g4 AT TIME ZONE): Spark has
# no TIMESTAMP WITH TIME ZONE type, so the zone cannot ride on the value
# (documented §1.2 deviation).  Two rewrites recover the semantics:
# timezone_hour/minute OVER an AT TIME ZONE argument compute the zone's
# UTC offset at that instant (what the reference returns), and the bare
# postfix becomes at_timezone() (same instant, shifted wall clock).
_AT_TZ_IN_ARG = re.compile(
    r"^(.*\S)\s+at\s+time\s+zone\s+(\x00\d+\x00|'[^']*')\s*$",
    re.IGNORECASE | re.DOTALL,
)
_AT_TZ_POSTFIX = re.compile(
    r"(\bTIMESTAMP\s+\x00\d+\x00|\x00\d+\x00|\w+(?:\([^()]*\))?)"
    r"\s+at\s+time\s+zone\s+(\x00\d+\x00|'[^']*')",
    re.IGNORECASE,
)


def _tz_field_rewrite(unit: str):
    def fn(args: list[str]) -> str | None:
        m = _AT_TZ_IN_ARG.match(args[0])
        if not m:
            return None
        expr, tz = m.groups()
        off = f"(unix_timestamp(from_utc_timestamp({expr}, {tz})) - unix_timestamp({expr}))"
        if unit == "hour":
            return f"CAST({off} / 3600 AS BIGINT)"
        return f"CAST(({off} % 3600) / 60 AS BIGINT)"

    return fn


def _tz_field_plain(unit: str):
    """timezone_hour/minute over a plain (zone-less) timestamp: the
    offset of the SESSION zone at that instant (reference
    DateTimeFunctions.timeZoneHourFromTimestamp on a session-zoned
    value).  The engine default pins UTC → 0; a session that sets
    spark.sql.session.timeZone gets that zone's offset."""

    def fn(args: list[str]) -> str | None:
        if _AT_TZ_IN_ARG.match(args[0]):
            return None
        a = args[0]
        if a.strip().lower() == "localtimestamp":
            a = "localtimestamp()"  # bare form only parses at top level
        # TIMESTAMP_NTZ (e.g. localtimestamp) doesn't shift under
        # from_utc_timestamp — normalize to TIMESTAMP first
        a = f"CAST({a} AS TIMESTAMP)"
        off = (
            f"(unix_timestamp(from_utc_timestamp({a}, current_timezone()))"
            f" - unix_timestamp({a}))"
        )
        if unit == "hour":
            return f"CAST({off} / 3600 AS BIGINT)"
        return f"CAST(({off} % 3600) / 60 AS BIGINT)"

    return fn


def _kurtosis_rewrite(args: list[str]) -> str | None:
    """Presto kurtosis = sample-corrected excess; Spark's is population
    g2 (see functions/aggregates_reg.kurtosis).  Same conversion, SQL
    spelling; NULL below 4 rows per the reference."""
    x = args[0]
    n = f"CAST(count({x}) AS DOUBLE)"
    return (
        f"(CASE WHEN count({x}) >= 4 THEN ({n}-1)/(({n}-2)*({n}-3))"
        f" * (({n}+1)*(kurtosis({x})+3) - 3*({n}-1)) END)"
    )


def _skewness_rewrite(args: list[str]) -> str | None:
    """Spark matches the reference's population skewness, but emits
    NaN/0 below 3 rows where the reference returns NULL."""
    x = args[0]
    return f"(CASE WHEN count({x}) >= 3 THEN skewness({x}) END)"


# Presto sorts NULLs LAST on ASC and FIRST on DESC (SortItem default,
# presto-parser); Spark defaults are the exact opposite.  Make every
# ORDER BY key's null placement explicit unless the query already did.
_ORDER_BY_KW = re.compile(r"\border\s+by\b", re.IGNORECASE)
_OB_TERM = re.compile(
    r"^(limit|offset|fetch|rows|range|groups|union|intersect|except|window)\b",
    re.IGNORECASE,
)
_HAS_NULLS = re.compile(r"\bnulls\s+(first|last)\s*$", re.IGNORECASE)
_ENDS_DESC = re.compile(r"\bdesc\s*$", re.IGNORECASE)


def _order_by_nulls(sql: str) -> str:
    out = sql
    pos = 0
    while True:
        m = _ORDER_BY_KW.search(out, pos)
        if not m:
            return out
        i, n = m.end(), len(out)
        items: list[tuple[int, int]] = []  # (start, end) spans
        start, depth = i, 0
        while i < n:
            ch = out[i]
            if ch == "\x00":  # masked literal: skip to closing sentinel
                i = out.index("\x00", i + 1) + 1
                continue
            if ch in "([":
                depth += 1
            elif ch in ")]":
                if depth == 0:
                    break
                depth -= 1
            elif ch == ";" and depth == 0:
                break
            elif ch == "," and depth == 0:
                items.append((start, i))
                start = i + 1
            elif depth == 0 and (ch.isalpha()) and _OB_TERM.match(out[i:]):
                # keyword terminators only count at a word boundary
                if i == 0 or not (out[i - 1].isalnum() or out[i - 1] in "_$"):
                    break
            i += 1
        items.append((start, i))
        # rewrite items back-to-front so earlier spans stay valid
        for s, e in reversed(items):
            item = out[s:e]
            body = item.rstrip()
            if not body.strip() or _HAS_NULLS.search(body):
                continue
            suffix = " NULLS FIRST" if _ENDS_DESC.search(body) else " NULLS LAST"
            out = out[:s] + body + suffix + item[len(body):] + out[e:]
        pos = m.end()


# Window functions that reject an explicit frame in Spark (Presto parses
# and ignores one: rank() OVER (... RANGE ...) is legal there), and the
# ranking subset that additionally requires ORDER BY in Spark while Presto
# treats a missing ORDER BY as all-rows-peers.
_NO_FRAME_FNS = ("dense_rank", "percent_rank", "cume_dist", "row_number", "rank", "ntile", "lag", "lead")
_RANKING_FNS = {"dense_rank", "percent_rank", "cume_dist", "row_number", "rank", "ntile"}
_WINFN_PAT = re.compile(r"\b(" + "|".join(_NO_FRAME_FNS) + r")\s*\(", re.IGNORECASE)
_OVER_PAT = re.compile(r"\s*(?:ignore\s+nulls\s+)?over\s*\(", re.IGNORECASE)


_WINARG_PAT = re.compile(r"\b(lag|lead|nth_value|ntile)\s*\(", re.IGNORECASE)


def _const_int_product(text: str, literals: list[str]) -> int | None:
    """Value of a product of integer literals / typed integer literals
    (BIGINT '8' * 1000 * 1000), else None."""
    prod = 1
    for part in text.split("*"):
        p = part.strip()
        if re.fullmatch(r"\d+", p):
            prod *= int(p)
            continue
        tm = re.fullmatch(
            r"(?:BIGINT|INTEGER|SMALLINT|TINYINT)\s*\x00(\d+)\x00"
            r"|CAST\s*\(\s*\x00(\d+)\x00\s+AS\s+"
            r"(?:BIGINT|INT|INTEGER|SMALLINT|TINYINT)\s*\)"
            r"|CAST\s*\(\s*(\d+)\s+AS\s+"
            r"(?:BIGINT|INT|INTEGER|SMALLINT|TINYINT)\s*\)",
            p,
            re.IGNORECASE,
        )
        if tm:
            try:
                if tm.group(3) is not None:
                    prod *= int(tm.group(3))
                else:
                    idx = tm.group(1) or tm.group(2)
                    prod *= int(literals[int(idx)][1:-1])
            except ValueError:
                return None
            continue
        return None
    return prod


def _window_arg_compat(sql: str, literals: list[str]) -> str:
    """Presto window-argument shapes Spark rejects:

    - lag/lead/nth_value/ntile with a literal NULL offset/bucket count
      produce NULL (the reference's null-argument semantics);
    - offsets beyond int32 clamp to 2147483647 — both exceed any
      partition, so the semantics (NULL/default) are identical;
    - nth_value with a PER-ROW offset becomes element_at over the
      frame's collect_list;
    - ntile with a per-row bucket count expands to Presto's bucket
      formula (NTileFunction: first `count % n` buckets get the extra
      row) over row_number/count windows.
    """
    out = sql
    pos = 0
    while True:
        m = _WINARG_PAT.search(out, pos)
        if not m:
            return out
        fn = m.group(1).lower()
        call_end, args = _scan_balanced(out, m.end() - 1)
        om = _OVER_PAT.match(out, call_end)
        if not om:
            pos = call_end
            continue
        spec_open = om.end() - 1
        spec_end, _ = _scan_balanced(out, spec_open)
        spec = out[spec_open + 1 : spec_end - 1]
        repl = None
        off_idx = 0 if fn == "ntile" else 1
        if len(args) > off_idx and args[off_idx].strip().upper() == "NULL":
            repl = "NULL"
        elif fn in ("lag", "lead", "nth_value") and len(args) > 1:
            v = _const_int_product(args[1], literals)
            if v is not None and v > 2147483647:
                clamped = args[:]
                clamped[1] = " 2147483647"
                repl = f"{fn}({','.join(clamped)}) OVER ({spec})"
            elif fn == "nth_value" and re.fullmatch(
                r"[A-Za-z_]\w*", args[1].strip()
            ):
                # per-row offset: index into the frame's value list;
                # the struct wrapper keeps NULL elements collect_list
                # would otherwise drop (NthValueFunction keeps them)
                repl = (
                    f"try_element_at(transform(collect_list("
                    f"named_struct('v', {args[0]})) OVER ({spec}),"
                    f" __s -> __s.v), CAST({args[1]} AS INT))"
                )
        elif fn == "ntile" and len(args) == 1 and not re.fullmatch(
            r"\s*\d+\s*", args[0]
        ):
            n = f"({args[0].strip()})"
            rn = f"row_number() OVER ({spec})"
            part = re.split(r"\border\s+by\b", spec, flags=re.IGNORECASE)[0].strip()
            cnt = f"count(*) OVER ({part})"
            q = f"({cnt} DIV {n})"
            r = f"({cnt} % {n})"
            p = f"({rn} - 1)"
            repl = (
                f"(CASE WHEN {n} IS NULL THEN NULL"
                f" WHEN {q} = 0 THEN {rn}"
                f" WHEN {p} < ({q} + 1) * {r} THEN {p} DIV ({q} + 1) + 1"
                f" ELSE {r} + ({p} - ({q} + 1) * {r}) DIV {q} + 1 END)"
            )
        if repl is None:
            pos = call_end
            continue
        out = out[: m.start()] + repl + out[spec_end:]
        pos = m.start() + len(repl)


def _window_compat(sql: str) -> str:
    """Presto→Spark window-spec fixes for rank-family and lag/lead:
    drop the (ignored-by-Presto) explicit frame, and emulate Presto's
    no-ORDER-BY all-peers semantics with ``ORDER BY 1`` (a constant —
    every row ties, so rank/dense_rank=1, percent_rank=0, cume_dist=1,
    matching the reference; row_number stays arbitrary-order, which is
    exactly Presto's behavior too).  Reference grammar: SqlBase.g4
    windowFrame is optional and unrestricted per function."""
    out = sql
    pos = 0
    while True:
        m = _WINFN_PAT.search(out, pos)
        if not m:
            return out
        fn = m.group(1).lower()
        call_end, _ = _scan_balanced(out, m.end() - 1)
        om = _OVER_PAT.match(out, call_end)
        if not om:
            pos = call_end
            continue
        spec_open = om.end() - 1
        spec_end, _ = _scan_balanced(out, spec_open)
        spec = out[spec_open + 1 : spec_end - 1]
        new_spec = re.sub(r"\b(rows|range|groups)\b.*$", "", spec, flags=re.IGNORECASE | re.DOTALL).rstrip()
        if fn in _RANKING_FNS and not re.search(r"\border\s+by\b", new_spec, re.IGNORECASE):
            new_spec = (new_spec + " ORDER BY 1").strip()
        out = out[: spec_open + 1] + new_spec + out[spec_end - 1 :]
        pos = spec_open + len(new_spec)


def _decimal_lit(m: re.Match) -> str:
    text = m.group(1)
    digits = text.lstrip("+-")
    scale = len(digits.split(".")[1]) if "." in digits else 0
    precision = max(1, len(digits.replace(".", "")))
    return f"CAST('{text}' AS DECIMAL({precision},{scale}))"


# --- decimal literal arithmetic folding (DecimalOperators.java) -------------
# Presto's decimal type-derivation rules differ from Spark's
# (allowPrecisionLoss): add/sub keep the max scale even at precision 38,
# multiply keeps scale s1+s2, and DIVIDE keeps scale max(s1,s2) with
# HALF_UP rounding (Spark widens to at least 6).  For literal operands —
# exactly what Presto's own constant folder sees — fold the arithmetic
# statically under the reference's rules.
_DEC_CAST_RE = (
    r"CAST\s*\(\s*\x00(\d+)\x00\s+AS\s+DECIMAL\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)\s*\)"
)
# operand n of a foldable decimal expression: a decimal-literal CAST, a
# typed integer literal, or a bare unsigned integer literal (Presto
# coerces INTEGER → DECIMAL(10,0), BIGINT → DECIMAL(19,0))
_INT_TYPE_PREC = {"tinyint": 3, "smallint": 5, "integer": 10, "bigint": 19}


def _fold_operand(n: int) -> str:
    return (
        rf"(?:CAST\s*\(\s*\x00(?P<l{n}>\d+)\x00\s+AS\s+DECIMAL\s*"
        rf"\(\s*(?P<p{n}>\d+)\s*,\s*(?P<s{n}>\d+)\s*\)\s*\)"
        rf"|(?P<t{n}>BIGINT|INTEGER|SMALLINT|TINYINT)\s*\x00(?P<tl{n}>\d+)\x00"
        rf"|(?<![\w.\x00])(?P<i{n}>\d+)(?![\w.\x00]))"
    )


def _operand_value(m: re.Match, n: int, literals: list[str]):
    """(Decimal value, precision, scale) of fold operand n, else None."""
    from decimal import Decimal

    if m.group(f"l{n}") is not None:
        return (
            Decimal(literals[int(m.group(f"l{n}"))][1:-1]),
            int(m.group(f"p{n}")),
            int(m.group(f"s{n}")),
        )
    if m.group(f"t{n}") is not None:
        v = Decimal(literals[int(m.group(f"tl{n}"))][1:-1])
        return v, _INT_TYPE_PREC[m.group(f"t{n}").lower()], 0
    v = Decimal(m.group(f"i{n}"))
    return v, (10 if abs(int(v)) <= 2**31 - 1 else 19), 0


def _fold_decimal_arith(sql: str, literals: list[str]) -> str:
    if "DECIMAL" not in sql.upper():
        return sql
    from decimal import ROUND_HALF_UP, Decimal, localcontext

    # collapse (CAST(..)) grouping parens only — never a function call's
    # argument parens (lookbehind rejects a preceding identifier char)
    paren = re.compile(
        r"(?<![\w\x00])\(\s*(CAST\s*\(\s*\x00\d+\x00\s+AS\s+DECIMAL\s*"
        r"\(\s*\d+\s*,\s*\d+\s*\)\s*\))\s*\)"
    )

    def _pat(ops: str) -> re.Pattern:
        return re.compile(
            _fold_operand(1) + r"\s*(?P<op>[" + ops + r"])\s*" + _fold_operand(2),
            re.IGNORECASE,
        )

    def _fold(m: re.Match) -> str | None:
        if m.group("l1") is None and m.group("l2") is None:
            return None  # int op int is integer arithmetic, not decimal
        op = m.group("op")
        try:
            a, p1, s1 = _operand_value(m, 1, literals)
            b, p2, s2 = _operand_value(m, 2, literals)
        except Exception:
            return None
        try:
            with localcontext() as ctx:
                ctx.prec = 90
                if op in "+-":
                    rs = max(s1, s2)
                    rp = min(38, max(p1 - s1, p2 - s2) + rs + 1)
                    v = a + b if op == "+" else a - b
                elif op == "*":
                    rs = s1 + s2
                    rp = min(38, p1 + p2)
                    if rs > 38:
                        return None
                    v = a * b
                elif op == "/":
                    rs = max(s1, s2)
                    rp = min(38, p1 + s2 + max(0, s2 - s1))
                    if b == 0:
                        return None
                    v = a / b
                else:  # %
                    rs = max(s1, s2)
                    rp = min(p1 - s1, p2 - s2) + rs
                    if b == 0:
                        return None
                    v = a % b
                v = v.quantize(Decimal(1).scaleb(-rs), rounding=ROUND_HALF_UP)
        except Exception:
            return None
        digits = len(v.as_tuple().digits)
        if digits > 38 or digits - rs > rp - rs and v != 0:
            return None  # Presto raises a decimal overflow here
        literals.append("'" + format(v, "f") + "'")
        return f"CAST(\x00{len(literals) - 1}\x00 AS DECIMAL({rp},{rs}))"

    out = sql
    for _ in range(12):
        changed = False
        out2 = paren.sub(r"\1", out)
        if out2 != out:
            out, changed = out2, True
        for ops in (r"*/%", r"+\-"):
            p = _pat(ops)
            pos = 0
            while True:
                m = p.search(out, pos)
                if not m:
                    break
                # precedence guards: skip if a tighter-binding neighbor
                # operator did not fold (stays textually adjacent)
                after = out[m.end() :].lstrip()[:1]
                before = out[: m.start()].rstrip()[-1:]
                if ops == r"+\-" and (after in "*/%" or before in "*/%"):
                    pos = m.end()
                    continue
                if m.group("i1") is not None and before in "+-":
                    # a bare-int left operand carrying a unary sign:
                    # folding would drop the sign — leave it to Spark
                    pos = m.end()
                    continue
                repl = _fold(m)
                if repl is None:
                    pos = m.end()
                    continue
                out = out[: m.start()] + repl + out[m.end() :]
                changed = True
                pos = m.start()
        if not changed:
            return out
    return out


# REAL → DECIMAL(p,s) casts go through Float.toString's decimal
# rendering in the reference (RealToDecimalCasts), not the exact binary
# expansion Spark uses.  Float.toString is not always the SHORTEST
# round-trip form (it can emit one extra digit), so the faithful route
# is the JVM's own renderer via reflect.
_REAL_DEC_CAST = re.compile(
    r"CAST\s*\(\s*REAL\s*(\x00\d+\x00)\s+AS\s+(DECIMAL"
    r"\s*\(\s*\d+\s*,\s*\d+\s*\))\s*\)",
    re.IGNORECASE,
)


def _fold_real_decimal_cast(sql: str, literals: list[str]) -> str:
    return _REAL_DEC_CAST.sub(
        lambda m: (
            f"CAST(reflect('java.lang.Float', 'toString',"
            f" CAST({m.group(1)} AS FLOAT)) AS {m.group(2)})"
        ),
        sql,
    )


# Spark constant-folds unary minus over a wide decimal literal in the
# DECIMAL128 context (34 significant digits) — negating a DECIMAL(38)
# literal silently loses the low digits.  Fold the sign into the
# literal statically.
_NEG_DEC_CAST = re.compile(
    r"-\s*CAST\s*\(\s*\x00(\d+)\x00\s+AS\s+(DECIMAL\s*\(\s*\d+\s*,\s*\d+\s*\))\s*\)",
    re.IGNORECASE,
)
_UNARY_PRECEDERS = {
    "select", "when", "then", "else", "and", "or", "not", "where",
    "having", "by", "on", "in", "values", "case", "between", "return",
    "union", "all", "distinct", "as", "from", "limit", "offset",
}


def _fold_decimal_negation(sql: str, literals: list[str]) -> str:
    out = sql
    pos = 0
    while True:
        m = _NEG_DEC_CAST.search(out, pos)
        if not m:
            return out
        head = out[: m.start()].rstrip()
        prev = head[-1:] if head else ""
        if prev and (prev.isalnum() or prev in ")]\x00"):
            # identifier/value before the minus → binary unless it is a
            # SQL keyword
            wm = re.search(r"(\w+)$", head)
            if not (wm and wm.group(1).lower() in _UNARY_PRECEDERS):
                pos = m.end()
                continue
        content = literals[int(m.group(1))][1:-1]
        neg = content[1:] if content.startswith("-") else "-" + content
        literals.append("'" + neg + "'")
        repl = f"CAST(\x00{len(literals) - 1}\x00 AS {m.group(2)})"
        out = out[: m.start()] + repl + out[m.end() :]
        pos = m.start() + len(repl)


# the reference test harness's bound input symbols and their page
# values (FunctionAssertions.java SOURCE_PAGE / INPUT_MAPPING).
# bound_timestamp is typed BIGINT in the harness (epoch millis of
# 2001-08-22 03:04:05.321 UTC); substituted pre-masking so the string
# values mask normally.
_BOUND_SYMBOLS = {
    "bound_integer": "CAST(1234 AS INT)",
    "bound_long": "CAST(1234 AS BIGINT)",
    "bound_string": "CAST('hello' AS STRING)",
    "bound_double": "CAST(12.34 AS DOUBLE)",
    "bound_boolean": "TRUE",
    "bound_timestamp_with_timezone": "TIMESTAMP '1970-01-01 00:01:00.999 UTC'",
    "bound_timestamp": "CAST(998449445321 AS BIGINT)",
    "bound_pattern": "CAST('%el%' AS STRING)",
    "bound_null_string": "CAST(NULL AS STRING)",
    "bound_binary_literal": "X'AB'",
}


def _strip_comments(sql: str) -> str:
    """Replace ``--``/``/* */`` comments (outside string literals) with a
    space.  Comments are whitespace to the grammar (SqlBase.g4
    SIMPLE_COMMENT / BRACKETED_COMMENT), but every depth/keyword scanner
    below would otherwise read keywords inside them."""
    parts: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            parts.append(sql[i : j + 1])
            i = j + 1
            continue
        if ch == '"':
            # a quoted identifier span ("a--b") — its content is not a
            # comment; doubled "" escapes a quote inside, like literals
            j = i + 1
            while j < n:
                if sql[j] == '"':
                    if j + 1 < n and sql[j + 1] == '"':
                        j += 2
                        continue
                    break
                j += 1
            parts.append(sql[i : j + 1])
            i = j + 1
            continue
        if ch == "-" and sql[i : i + 2] == "--":
            j = sql.find("\n", i)
            parts.append(" ")
            i = n if j == -1 else j  # keep the newline itself
            continue
        if ch == "/" and sql[i : i + 2] == "/*":
            j = sql.find("*/", i + 2)
            parts.append(" ")
            i = n if j == -1 else j + 2
            continue
        parts.append(ch)
        i += 1
    return "".join(parts)


def translate(sql: str) -> str:
    """Presto-dialect SQL → Spark SQL."""
    # Comments are whitespace; strip them first so no scanner below can
    # read keywords inside them
    sql = _strip_comments(sql)
    # Mask string literals so owned names inside quotes are never
    # rewritten ('... strpos(' stays text).  The datetime-pattern rules
    # (_DATE_ADD/_DATE_FORMAT/_DECIMAL_LIT) intentionally run with
    # literals visible — they must read the quoted text; masking happens
    # after.
    out = _DECIMAL_LIT.sub(_decimal_lit, sql)
    out = _DATE_ADD.sub(lambda m: f"timestampadd({m.group(1).upper()},", out)
    out = _DATE_DIFF.sub(lambda m: f"timestampdiff({m.group(1).upper()},", out)

    def _fmt(m: re.Match) -> str:
        fn, arg, pat = m.group(1).lower(), m.group(2), m.group(3)
        if "%" not in pat:
            return m.group(0)
        # _mysql_to_java single-quotes literal alpha chars ('T'); escape
        # them ('' inside a SQL literal) before re-wrapping in quotes.
        java = _mysql_to_java(pat).replace("'", "''")
        if fn == "date_parse":
            return f"to_timestamp({arg}, '{java}')"
        return f"date_format({arg}, '{java}')"

    out = _DATE_FORMAT.sub(_fmt, out)
    # FunctionAssertions / TestExpressionCompiler bound symbols — the
    # harness's SOURCE_PAGE channel values (FunctionAssertions.java:155)
    if "bound_" in out:
        for sym, val in _BOUND_SYMBOLS.items():
            out = re.sub(rf"\b{sym}\b", val, out)
    # X'AB CD' binary literals allow whitespace in the reference grammar;
    # Spark's don't
    out = re.sub(
        r"\bX'([0-9a-fA-F \t]*)'",
        lambda m: "X'" + re.sub(r"\s", "", m.group(1)) + "'",
        out,
        flags=re.IGNORECASE,
    )
    # pre-masking pass: ${name} replacement references need to read the
    # pattern and replacement literals
    out = _rewrite_calls(out, "regexp_replace", _regexp_named_refs_rewrite)
    # mask literals so no rewrite below can touch quoted text
    literals: list[str] = []

    def _mask(m: re.Match) -> str:
        literals.append(m.group(0))
        return f"\x00{len(literals) - 1}\x00"

    out = _STRING_LIT.sub(_mask, out)
    # Presto double-quotes are ALWAYS identifiers (never strings) —
    # Spark's identifier quote is the backtick.  Runs after literal
    # masking so quotes inside string literals stay untouched; covers
    # quoted function names too ("sum"(x) → `sum`(x), which Spark parses).
    out = re.sub(r'"([^"]+)"', r"`\1`", out)
    # Presto CREATE [OR REPLACE] VIEW is a catalog view
    # (presto-parser/.../CreateView.java); the Spark analog over session
    # temp views is a TEMPORARY view (a permanent Spark view cannot
    # reference temp-view base tables).  Documented deviation: scope is
    # the session, not the metastore.
    out = re.sub(
        r"^\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\b",
        "CREATE OR REPLACE TEMPORARY VIEW",
        out,
        flags=re.IGNORECASE,
    )
    out = _TABLESAMPLE.sub(lambda m: f"TABLESAMPLE ({m.group(1)} PERCENT)", out)
    out = _LIMIT_ALL.sub("", out)
    # paren-aware constructs (argument-splitting scanners)
    out = _array_literals(out)
    out = _element_array_concat(out, literals)
    out = _array_cmp_decimal_compat(out, literals)
    # harness helper: unchecked_to_json('x') IS the JSON literal
    out = re.sub(
        r"\bunchecked_to_json\s*\(\s*(\x00\d+\x00)\s*\)", r"JSON \1", out,
        flags=re.IGNORECASE,
    )
    # Spark rejects an untyped NULL as a CASE condition
    out = re.sub(
        r"\bWHEN\s+NULL\s+THEN\b", "WHEN CAST(NULL AS BOOLEAN) THEN", out,
        flags=re.IGNORECASE,
    )
    # ... or as a WHERE/HAVING filter (Presto types it BOOLEAN); only
    # when NULL is the WHOLE predicate (WHERE NULL IN (...) keeps the
    # untyped NULL so the IN comparison types it)
    out = re.sub(
        r"\b(WHERE|HAVING)\s+NULL\b"
        r"(?=\s*(?:$|\)|GROUP\b|ORDER\b|LIMIT\b|UNION\b|INTERSECT\b|EXCEPT\b))",
        r"\1 CAST(NULL AS BOOLEAN)",
        out,
        flags=re.IGNORECASE,
    )
    # GROUP BY () is the empty grouping set == global aggregation
    out = re.sub(r"\bGROUP\s+BY\s+\(\s*\)", "", out, flags=re.IGNORECASE)
    # per query level: the GROUP BY item scan must never read past the
    # enclosing subquery's closing paren
    out = _per_query_level(out, _group_by_distinct_compat)
    out = _harness_lambda_compat(out, literals)
    # zero-arg count() counts rows, like count(*) (the reference parser
    # admits it; Spark requires the explicit star)
    out = re.sub(r"(?i)\bcount\s*\(\s*\)", "count(*)", out)
    out = _derived_scalar_wrapper_flatten(out)
    out = _per_query_level(out, _join_on_subquery_compat)
    out = _per_query_level(out, _group_by_scalar_subquery_hoist)
    out = _exists_no_from_compat(out)
    out = _trivial_scalar_subquery_collapse(out)
    out = _per_query_level(out, _using_join_wildcard_compat)
    out = _order_by_mixed_scope_compat(out)
    out = _order_by_subquery_hoist(out)
    out = _order_by_alias_subst(out)
    out = _real_decimal_cmp_compat(out)
    out = _values_lambda_compat(out)
    out = _quantified_compat(out)
    out = _map_in_compat(out)
    out = _in_values_compat(out)
    # per query level: the duplicate-projection guard must count within
    # ONE query body — a set-op of two identical halves (or any repeated
    # derived table) would otherwise suppress the rewrite in BOTH halves
    # (round-7 fuzz finding, setop mutator)
    out = _per_query_level(out, _in_subquery_3vl_compat)
    out = _empty_grouping_sets_compat(out)
    out = _grouping_plain_scope_fold(out)
    out = _grouping_compat(out)
    out = _rewrite_calls_window_aware(
        out, "approx_percentile", _approx_percentile_rewrite, _approx_percentile_interp
    )
    # per query level: the no-other-aggregate guard must look only at
    # ITS query's select/having text, not the whole statement
    out = _per_query_level(out, _parity_agg_compat)
    out = _rewrite_calls(out, "TRY", lambda a: _try_rewrite(a, literals))
    # fixpoint: a rewritten outer TRY_CAST may embed an unprocessed
    # nested try_cast (the call scanner skips replacement text)
    for _ in range(4):
        prev_tc = out
        out = _rewrite_calls(out, "TRY_CAST", _try_cast_rewrite)
        if out == prev_tc:
            break
    # fixpoint: a folded inner CAST(.. AS JSON) re-exposes a JSON
    # literal an outer CAST(.. AS MAP/ARRAY/ROW) can then consume
    for _ in range(4):
        prev_json = out
        out = _rewrite_calls(out, "CAST", _json_cast_rewrite(literals))
        if out == prev_json:
            break
    out = _json_literal_eq(out, literals)
    out = _row_eq_compat(out)
    out = _map_eq_compat(out)
    out = _char_eq_compat(out)
    out = _char_distinct_between_compat(out)

    def _typeof_static(args: list[str]) -> str | None:
        # Presto tracks VARCHAR lengths in the static type
        # (TypeOfFunction.java); Spark erases them at runtime.  The two
        # statically decidable shapes: a string literal (varchar(len))
        # and an explicit CAST(.. AS VARCHAR(n)).  Runs BEFORE the CAST
        # pass, which lowers VARCHAR(n) casts to substr truncation.
        if len(args) != 1:
            return None
        a = args[0].strip()
        lm = re.fullmatch(r"\x00(\d+)\x00", a)
        if lm:
            content = literals[int(lm.group(1))][1:-1].replace("''", "'")
            return f"'varchar({len(content)})'"
        cm = re.fullmatch(
            r"CAST\s*\(.*\bAS\s+VARCHAR\s*\((\d+)\)\s*\)", a,
            re.IGNORECASE | re.DOTALL,
        )
        if cm:
            return f"'varchar({cm.group(1)})'"
        return None

    out = _rewrite_calls(out, "typeof", _typeof_static)

    def _vl_static(args: list[str]) -> str | None:
        # the reference TEST harness's vl() probe returns the declared
        # VARCHAR length (TestStringFunctions.java registers it);
        # statically decidable for the same shapes typeof resolves
        if len(args) != 1:
            return None
        a = args[0].strip()
        lm = re.fullmatch(r"\x00(\d+)\x00", a)
        if lm:
            content = literals[int(lm.group(1))][1:-1].replace("''", "'")
            return f"CAST({len(content)} AS BIGINT)"
        cm = re.fullmatch(
            r"CAST\s*\(.*\bAS\s+VARCHAR\s*\((\d+)\)\s*\)", a,
            re.IGNORECASE | re.DOTALL,
        )
        if cm:
            return f"CAST({cm.group(1)} AS BIGINT)"
        return None

    out = _rewrite_calls(out, "vl", _vl_static)
    # to fixpoint: a rewritten outer CAST skips nested CASTs inside its
    # replacement (the scanner resumes past it)
    for _ in range(5):
        prev_cast = out
        out = _rewrite_calls(out, "CAST", _cast_rewrite)
        if out == prev_cast:
            break
    # VALUES ROW(..) is the grammar's explicit row constructor — strip
    # the keyword BEFORE the generic ROW() → named_struct pass
    out = _values_row_strip(out)
    # ROW(..) value constructor → named_struct with Presto's anonymous
    # field names field0..fieldN (RowType.java), so .fieldN accessors
    # resolve; runs after the CAST pass has consumed ROW(...) types
    def _row_ctor(args: list[str]) -> str | None:
        if len(args) == 1 and not args[0].strip():
            return None
        fields = ", ".join(
            f"'field{i}', {a}" for i, a in enumerate(args)
        )
        return f"named_struct({fields})"

    for _ in range(5):  # nested ROW constructors
        prev_row = out
        out = _rewrite_calls(out, "row", _row_ctor)
        if out == prev_row:
            break

    def _map_ctor(args: list[str]) -> str | None:
        # Presto MAP(key_array, value_array) / MAP() constructors
        # (MapConstructor.java); type spellings are already consumed by
        # the CAST pass above.  Spark's 2-arg map() would build a
        # single-entry map<array,array> instead.  Only fires when an
        # argument is STATICALLY array-typed, so Spark-style scalar
        # map(k, v) entry-constructors pass through untouched.
        if len(args) == 2 and any(
            re.match(r"^\s*(?:array\s*\(|CAST\s*\(.*\bAS\s+ARRAY)", a,
                     re.IGNORECASE | re.DOTALL)
            for a in args
        ):
            return f"map_from_arrays({args[0]}, {args[1]})"
        if len(args) == 1 and not args[0].strip():
            return "map()"
        return None

    for _ in range(5):  # nested MAP constructors (map values/keys)
        prev_map = out
        out = _rewrite_calls(out, "map", _map_ctor)
        if out == prev_map:
            break
    out = _rewrite_calls(out, "classify", _classify_rewrite)
    out = _rewrite_calls(out, "learn_classifier", _learn_classifier_rewrite)
    out = _rewrite_calls(out, "features", _features_rewrite)
    out = _rewrite_calls(out, "random", _random_rewrite)
    out = _rewrite_calls(out, "timezone_hour", _tz_field_rewrite("hour"))
    out = _rewrite_calls(out, "timezone_minute", _tz_field_rewrite("minute"))
    out = _rewrite_calls(out, "timezone_hour", _tz_field_plain("hour"))
    out = _rewrite_calls(out, "timezone_minute", _tz_field_plain("minute"))
    out = _fold_decimal_negation(out, literals)
    out = _fold_decimal_arith(out, literals)
    out = _fold_real_decimal_cast(out, literals)
    out = _transform_fractional_cast(out)
    out = _division_compat(out, literals)
    out = _extract_compat(out, literals)
    out = _rewrite_calls(out, "extract", _extract_field_rewrite)
    # the TIMEZONE_HOUR/MINUTE extract fields emit timezone_* calls,
    # and the scalar lowering pass has already run — re-apply it
    out = _rewrite_calls(out, "timezone_hour", _tz_field_rewrite("hour"))
    out = _rewrite_calls(out, "timezone_minute", _tz_field_rewrite("minute"))
    out = _rewrite_calls(out, "timezone_hour", _tz_field_plain("hour"))
    out = _rewrite_calls(out, "timezone_minute", _tz_field_plain("minute"))
    out = _like_compat(out, literals)
    out = _rewrite_calls(out, "split", _split_rewrite)
    out = _rewrite_calls(out, "map_zip_with", _map_zip_with_int_div(literals))
    out = _rewrite_calls(out, "map_entries", _map_entries_mapkey_rewrite)
    out = _rewrite_calls(out, "multimap_from_entries", _multimap_from_entries_rewrite)
    out = _rewrite_calls(out, "map_from_entries", _map_from_entries_edge_rewrite)
    out = _rewrite_calls(out, "map_concat", _map_concat_null_rewrite)
    out = _rewrite_calls(out, "split_to_map", _split_to_map_rewrite)
    out = _rewrite_calls(out, "split_to_multimap", _split_to_multimap_rewrite)
    out = _rewrite_calls(out, "regexp_split", _regexp_split_rewrite(literals))
    # Presto repeat(v, n) builds an array (ArrayFunctions.repeat);
    # Spark's repeat is string repetition
    out = _rewrite_calls(
        out, "repeat", lambda a: f"array_repeat({a[0]}, {a[1]})" if len(a) == 2 else None
    )
    # flatten skips NULL inner arrays (ArrayFlattenFunction); Spark
    # propagates the NULL to the whole result
    out = _rewrite_calls(
        out,
        "flatten",
        lambda a: f"flatten(filter({a[0]}, __f -> __f IS NOT NULL))"
        if len(a) == 1 and a[0].strip()
        else None,
    )
    # array_intersect returns elements in ascending order, NULL first
    # (ArrayIntersectFunction compares with the type's ordering);
    # literal decimal operands harmonize to the max scale first
    _ai_harm = _array_numeric_binary_rewrite("array_intersect")(literals)

    def _ai(a: list[str]) -> str | None:
        if len(a) != 2:
            return None
        h = _ai_harm(a)
        if h is not None:
            return f"sort_array({h})"
        return f"sort_array(array_intersect({a[0]}, {a[1]}))"

    out = _rewrite_calls(out, "array_intersect", _ai)
    out = _rewrite_calls(
        out, "array_remove", _array_numeric_binary_rewrite("array_remove")(literals)
    )
    out = _zoned_literal_compat(out, literals)
    out = _rewrite_calls(out, "reduce", _reduce_rewrite)
    out = _rewrite_calls(out, "array_except", _array_except_null_rewrite)
    out = _rewrite_calls(out, "contains", _contains_rewrite)
    out = _rewrite_calls(out, "array_position", _array_position_null_rewrite)
    out = _rewrite_calls(out, "array_position", _array_position_numeric_rewrite)
    out = _rewrite_calls(out, "concat", _concat_null_array_rewrite)
    out = _TYPED_LIT_POST.sub(lambda m: _typed_literal(m, literals), out)
    out = _ipaddress_cmp_compat(out)
    out = _rewrite_calls(out, "if", _if2_rewrite)
    out = _rewrite_calls(out, "cosine_similarity", _cosine_sim_map_rewrite)
    out = _rewrite_calls(out, "truncate", _truncate_rewrite)
    out = _rewrite_calls(out, "bit_count", _bit_count_rewrite)
    out = _rewrite_calls(out, "replace", _replace_rewrite)
    out = _rewrite_calls(out, "chr", _chr_rewrite)
    out = _rewrite_calls(out, "is_json_scalar", _is_json_scalar_rewrite)
    out = _rewrite_calls(out, "word_stem", _word_stem_rewrite)
    out = _rewrite_calls(out, "regexp_replace", _regexp_replace_rewrite)
    out = _rewrite_calls(out, "regexp_extract_all", _regexp_extract_all_rewrite)
    out = _rewrite_calls(out, "regexp_extract", _regexp_extract_rewrite)
    # after the regexp rewrites: their lambda overload resolves x[i]
    # group references itself; remaining brackets are 1-based subscripts
    out = _subscript_compat(out)
    out = _rewrite_calls(out, "greatest", _greatest_least_rewrite("greatest"))
    out = _rewrite_calls(out, "least", _greatest_least_rewrite("least"))
    out = _rewrite_calls(out, "substring", _substr_rewrite)
    out = _rewrite_calls(out, "substr", _substr_rewrite)
    out = _rewrite_calls(out, "width_bucket", _width_bucket_rewrite)
    out = _rewrite_calls(out, "json_array_contains", _json_array_contains_rewrite)
    out = _rewrite_calls(out, "json_array_get", _json_array_get_rewrite)

    def _json_parse_canon(args: list[str]) -> str | None:
        # json_parse('literal') canonicalizes at parse time in the
        # reference (JsonFunctions.jsonParse); for literal arguments the
        # shim does the same statically, else the value passes through
        # (the engine's JSON representation is the string itself)
        if len(args) != 1:
            return None
        lm = re.fullmatch(r"\x00(\d+)\x00", args[0].strip())
        if lm:
            idx = int(lm.group(1))
            content = literals[idx][1:-1].replace("''", "'")
            literals[idx] = "'" + _canon_json_text(content).replace("'", "''") + "'"
        return f"({args[0]})"

    out = _rewrite_calls(out, "json_parse", _json_parse_canon)
    out = _rewrite_calls(out, "split_part", _split_part_rewrite)
    out = _rewrite_calls(out, "ltrim", _trim2_rewrite("LEADING"))
    out = _rewrite_calls(out, "rtrim", _trim2_rewrite("TRAILING"))
    out = _rewrite_calls(out, "trim", _trim2_rewrite("BOTH"))
    out = _rewrite_calls(out, "normalize", _normalize_rewrite)
    out = _rewrite_calls(out, "from_utf8", _from_utf8_rewrite)
    for _name, _tpl in _SQL_TEMPLATES.items():
        out = _rewrite_calls(out, _name, _template_rewrite(_tpl))
    out = _typeof_spelling_compat(out)
    # inline the registry's at_timezone expansion (datetime_fns.at_timezone)
    # — at_timezone itself is a Column builder, not a Spark SQL function
    out = _AT_TZ_POSTFIX.sub(
        lambda m: (
            f"from_utc_timestamp(to_utc_timestamp({m.group(1)}, 'UTC'), {m.group(2)})"
        ),
        out,
    )
    out = _rewrite_calls(out, "kurtosis", _kurtosis_rewrite)
    out = _rewrite_calls(out, "skewness", _skewness_rewrite)
    out = _rewrite_calls(out, "map_agg", _map_agg_sql)
    out = _rewrite_calls(out, "multimap_agg", _multimap_agg_sql)
    out = _rewrite_calls(out, "max_by", _minmax_by_n(desc=True))
    out = _rewrite_calls(out, "min_by", _minmax_by_n(desc=False))
    out = _array_agg_compat(out)
    out = _from_join_parens_strip(out)
    out = _unnest_rewrite(out)
    out = _window_arg_compat(out, literals)
    out = _window_compat(out)
    out = _order_by_nulls(out)
    # longest names first so json_extract_scalar wins over json_extract
    for presto in sorted(_RENAMES, key=len, reverse=True):
        out = _rename(out, presto, _RENAMES[presto])
    return re.sub(
        r"\x00(\d+)\x00",
        lambda m: _spark_safe_literal(literals[int(m.group(1))]),
        out,
    )


def _spark_safe_literal(lit: str) -> str:
    """Spark's lexer treats ``\\'`` as a quote escape even in raw
    (escapedStringLiterals) mode, so a literal whose content has an
    odd-length backslash run directly before a quote or at the end
    cannot be spelled as a plain literal — splice the stray backslash
    in as ``chr(92)``."""
    content = lit[1:-1]
    if "\\" not in content:
        return lit
    parts: list[str] = []
    buf = ""
    i, n = 0, len(content)
    while i < n:
        if content[i] == "\\":
            j = i
            while j < n and content[j] == "\\":
                j += 1
            run = j - i
            if run % 2 == 1 and (j >= n or content[j] == "'"):
                buf += "\\" * (run - 1)
                parts.append(f"'{buf}'")
                parts.append("chr(92)")
                buf = ""
            else:
                buf += "\\" * run
            i = j
        else:
            buf += content[i]
            i += 1
    if buf or not parts:
        parts.append(f"'{buf}'")
    return parts[0] if len(parts) == 1 else "(" + " || ".join(parts) + ")"
