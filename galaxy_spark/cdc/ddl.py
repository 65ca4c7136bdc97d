"""ALTER TABLE parser for DDL-driven schema evolution (P5).

Behavioral parity target: the reference's hand-rolled tokenizer
(``internal/sync_server/baseinfo.go:100-251``), which handles
``ALTER TABLE [db.]tbl  ADD [COLUMN] name [type ...] [FIRST|AFTER x]
| DROP [COLUMN] name | CHANGE old new [type ...] | MODIFY ...`` with
dbeaver-style ``/* ... */`` comment prefixes
(corpus at ``internal/sync_server/sync_test.go:127-156``).

Deliberate improvements over the reference (documented divergences):

- backticked/quoted identifiers are unquoted (the reference's
  space-split breaks on them);
- added columns KEEP their declared type (the reference stores
  added columns with no type, ``baseinfo.go:198,206,213-215``);
- ``MODIFY`` updates the column type (the reference ignores it,
  ``baseinfo.go:129-131``) — position semantics FIRST/AFTER are
  honored for MODIFY too;
- multiple comma-separated alter specs in one statement are applied
  in order (real MySQL allows it; the reference only reads the first).

Statements that are not ALTER TABLE (including bare ``BEGIN`` which
precedes row events in the binlog) parse to ``None``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_COMMENT_RE = re.compile(r"/\*.*?\*/", re.S)
_IDENT_QUOTES = "`\"'"


@dataclass(frozen=True)
class AddColumn:
    name: str
    col_type: str | None = None
    position: str | None = None   # None | "FIRST" | "AFTER:<col>"


@dataclass(frozen=True)
class DropColumn:
    name: str


@dataclass(frozen=True)
class RenameColumn:
    old_name: str
    new_name: str
    col_type: str | None = None


@dataclass(frozen=True)
class ModifyColumn:
    name: str
    col_type: str | None = None
    position: str | None = None


AlterOp = AddColumn | DropColumn | RenameColumn | ModifyColumn


@dataclass(frozen=True)
class AlterStatement:
    database: str | None
    table: str
    ops: tuple[AlterOp, ...]


def _unquote(ident: str) -> str:
    ident = ident.strip()
    if ident and ident[0] in _IDENT_QUOTES and ident[-1] == ident[0]:
        return ident[1:-1]
    return ident


def _split_specs(clause: str) -> list[str]:
    """Split the alter-spec tail on top-level commas (not inside
    parens, e.g. decimal(10,2))."""
    specs, depth, cur = [], 0, []
    for ch in clause:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            specs.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        specs.append("".join(cur))
    return [s.strip() for s in specs if s.strip()]


_STOPWORDS_AFTER_TYPE = {
    "null", "not", "default", "character", "collate", "comment",
    "first", "after", "auto_increment", "unsigned", "primary", "unique",
}


def _parse_type_and_position(tokens: list[str]) -> tuple[str | None, str | None]:
    """From tokens after the column name: extract the type string
    (first token + optional 'unsigned') and FIRST/AFTER position."""
    col_type = None
    if tokens and tokens[0].lower() not in _STOPWORDS_AFTER_TYPE:
        col_type = tokens[0].lower()
        if len(tokens) > 1 and tokens[1].lower() == "unsigned":
            col_type += " unsigned"
    position = None
    low = [t.lower() for t in tokens]
    if low and low[-1] == "first":
        position = "FIRST"
    elif len(low) >= 2 and low[-2] == "after":
        position = f"AFTER:{_unquote(tokens[-1])}"
    return col_type, position


def parse_alter(query: str) -> AlterStatement | None:
    """Parse one statement; returns None if it isn't ALTER TABLE."""
    if not query:
        return None
    text = _COMMENT_RE.sub(" ", query).strip().rstrip(";").strip()
    m = re.search(r"\balter\s+table\b", text, re.I)
    if not m:
        return None
    tail = text[m.end():].strip()
    # target identifier = first whitespace-delimited token
    parts = tail.split(None, 1)
    if len(parts) < 2:
        return None
    target, clause = parts
    if "." in _unquote(target) and not (
            target[0] in _IDENT_QUOTES and target[-1] == target[0]
            and "." not in target[1:-1]):
        db_part, tbl_part = target.split(".", 1)
        database, table = _unquote(db_part), _unquote(tbl_part)
    else:
        database, table = None, _unquote(target)

    ops: list[AlterOp] = []
    for spec in _split_specs(clause):
        spec = re.sub(r"\s+\(", "(", spec)
        toks = spec.split()
        if not toks:
            continue
        action = toks[0].lower()
        rest = toks[1:]
        had_column_kw = bool(rest) and rest[0].lower() == "column"
        if had_column_kw:
            rest = rest[1:]
        if not rest:
            continue
        # ADD/DROP INDEX|KEY|CONSTRAINT|... are schema-neutral for
        # column projection and MUST NOT be read as column ops —
        # 'ADD INDEX idx(email)' once inserted a phantom column
        # named 'index' and quarantined the whole table. The bare
        # keyword is an index op ONLY without the COLUMN keyword:
        # a column legitimately named `key` arrives quoted or as
        # 'ADD COLUMN key ...', which had_column_kw distinguishes.
        if (not had_column_kw and action in ("add", "drop")
                and rest[0].lower() in (
                    "index", "key", "unique", "primary", "fulltext",
                    "spatial", "foreign", "constraint", "check",
                    "partition")):
            continue
        if action == "drop":
            ops.append(DropColumn(_unquote(rest[0])))
        elif action == "add":
            name = _unquote(rest[0])
            col_type, position = _parse_type_and_position(rest[1:])
            ops.append(AddColumn(name, col_type, position))
        elif action == "rename" and had_column_kw:
            # MySQL 8.0 'RENAME COLUMN old TO new' — silently
            # skipping it left the registry stale under the most
            # common 8.0 rename syntax (arity unchanged, so rows
            # kept projecting under the obsolete name). 'RENAME TO
            # t2' / 'RENAME KEY' have no COLUMN keyword and stay
            # schema-neutral below.
            if len(rest) >= 3 and rest[1].lower() == "to":
                ops.append(RenameColumn(_unquote(rest[0]),
                                        _unquote(rest[2])))
        elif action == "change":
            if len(rest) < 2:
                continue
            old, new = _unquote(rest[0]), _unquote(rest[1])
            col_type, _ = _parse_type_and_position(rest[2:])
            ops.append(RenameColumn(old, new, col_type))
        elif action == "modify":
            name = _unquote(rest[0])
            col_type, position = _parse_type_and_position(rest[1:])
            ops.append(ModifyColumn(name, col_type, position))
        # other actions (RENAME TO, engine options, indexes) are
        # schema-neutral for column projection — skipped like the
        # reference's default case
    if not ops:
        return None
    return AlterStatement(database, table, tuple(ops))
