"""Property tests for the streaming-expression parser: any tree the
grammar can express round-trips through its string form unchanged, and
arbitrary junk input fails ONLY with StreamExprError (the CLI's 400
mapping depends on that)."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from solr_ocr_processor_spark.operators.stream_expr import (
    Node,
    StreamExprError,
    parse,
)

_IDENTS = st.from_regex(r"[a-z_][a-z0-9_]{0,6}", fullmatch=True)
# quoted values: anything but the quote char itself (no escape syntax)
_QUOTED = st.text(
    alphabet=string.ascii_lowercase + string.digits + " ,.:-*?[]()=^$|+",
    max_size=12,
)
# bare values: no comma/paren/equals/space/quote, not confusable with a call
_BARE = st.from_regex(r"[a-z0-9*._-]{1,8}", fullmatch=True)


def _nodes(depth: int = 2) -> st.SearchStrategy:
    if depth == 0:
        return st.builds(
            Node,
            name=_IDENTS,
            args=st.lists(_BARE, max_size=2),
            kwargs=st.dictionaries(_IDENTS, _QUOTED, max_size=2),
            out_alias=st.none(),
        )
    sub = _nodes(depth - 1)
    aliased = st.builds(
        lambda n, a: Node(n.name, n.args, n.kwargs, a),
        sub,
        st.one_of(st.none(), _IDENTS),
    )
    return st.builds(
        Node,
        name=_IDENTS,
        args=st.lists(st.one_of(_BARE, aliased), max_size=3),
        kwargs=st.dictionaries(_IDENTS, st.one_of(_QUOTED, sub), max_size=2),
        out_alias=st.none(),
    )


def _unparse(n: Node) -> str:
    parts = []
    for a in n.args:
        if isinstance(a, Node):
            s = _unparse(a)
            if a.out_alias:
                s += f" as {a.out_alias}"
            parts.append(s)
        else:
            parts.append(a)
    for k, v in n.kwargs.items():
        parts.append(f'{k}={_unparse(v) if isinstance(v, Node) else chr(34) + v + chr(34)}')
    return f"{n.name}({', '.join(parts)})"


@settings(max_examples=300, deadline=None)
@given(_nodes())
def test_parse_roundtrips_unparse(tree):
    assert parse(_unparse(tree)) == tree


@settings(max_examples=500, deadline=None)
@given(st.text(max_size=40))
def test_junk_raises_only_stream_expr_error(s):
    try:
        parse(s)
    except StreamExprError:
        pass  # the only failure type the CLI 400 mapping handles
