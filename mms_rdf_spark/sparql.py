"""SPARQL-pattern helpers over the triples tables.

The reference delegates all querying to an external SPARQL endpoint
(src/action/query.js + endpoint.js — it contains no query engine,
SURVEY.md §3.3). Here Catalyst IS the engine; this module packages the
recurring SPARQL shapes from the reference's embedded queries and demo
notebooks (SURVEY.md §2.10) as composable DataFrame functions, so a
user can write the notebook queries almost 1:1:

    g = Graph(triples_df)
    unused = g.subjects_of_type("mms-class:Activity") \\
              .join(g.pattern("?s", "mms-property:activity", "?o")
                     .select(F.col("o").alias("subject")),
                    on="subject", how="left_anti")

Every helper compiles to plain relational ops — equi/semi/anti joins
Catalyst can reorder, broadcast, and AQE-optimize.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RDF_NIL = "rdf:nil"


class Graph:
    """A triples DataFrame wrapped with SPARQL-ish accessors."""

    def __init__(self, triples: DataFrame):
        self.t = triples

    # --- basic graph patterns -------------------------------------
    def pattern(self, s: str | None = None, p: str | None = None,
                o: str | None = None) -> DataFrame:
        """One BGP triple pattern. Constants filter; '?x' / None stay
        free. Returns (subject, predicate, object, ...)."""
        df = self.t
        for col, v in (("subject", s), ("predicate", p), ("object", o)):
            if v is not None and not v.startswith("?"):
                df = df.where(F.col(col) == v)
        return df

    def bgp(self, *steps: tuple[str, str]) -> DataFrame:
        """Property-path chain: steps = [(p1, v1), (p2, v2), ...] walks
        subject -p1-> v1 -p2-> v2 ... Returns (subject, v1, v2, ...)."""
        out = None
        prev = "subject"
        for i, (pred, name) in enumerate(steps):
            hop = self.pattern(p=pred).select(
                F.col("subject").alias(prev if i == 0 else f"_{prev}"),
                F.col("object").alias(name))
            if out is None:
                out = hop
            else:
                out = out.join(hop.withColumnRenamed(f"_{prev}", prev),
                               on=prev)
            prev = name
        return out.select("subject", *[n for _, n in steps])

    # --- SPARQL filter shapes --------------------------------------
    def subjects_of_type(self, cls: str) -> DataFrame:
        return (self.pattern(p="rdf:type", o=cls)
                .select("subject").distinct())

    def not_exists(self, base: DataFrame, p: str,
                   on: str = "subject") -> DataFrame:
        """FILTER NOT EXISTS {?on p ?any} — the anti-join shape
        (reference ammend.js:35-38, notebook cells 9/15/17)."""
        has = self.pattern(p=p).select(F.col("subject").alias(on)).distinct()
        return base.join(has, on=on, how="left_anti")

    def values(self, base: DataFrame, col: str,
               inline: list[str]) -> DataFrame:
        """VALUES inline table -> isin (notebook cell 19)."""
        return base.where(F.col(col).isin(inline))

    def is_nil(self, p: str) -> DataFrame:
        """?s p rdf:nil — emptiness test (notebook cells 11/13)."""
        return self.pattern(p=p, o=RDF_NIL).select("subject").distinct()

    def construct(self, base: DataFrame, s: Column, p: str,
                  o: Column) -> DataFrame:
        """CONSTRUCT projection: rows -> new triples (cells 3/5/6)."""
        return base.select(
            s.alias("subject"), F.lit(p).alias("predicate"), o.alias("object"),
            F.lit(True).alias("object_is_iri"),
            F.lit(None).cast("string").alias("datatype"),
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("int").alias("idx"),
        )

    def closure_join(self, closure: DataFrame, cls: str) -> DataFrame:
        """?s rdf:type/rdfs:subClassOf* cls — type check through the
        precomputed hierarchy closure (reference triplifier.js:453-455)."""
        subs = closure.where(F.col("sup") == cls) \
            .select(F.col("sub").alias("object"))
        return (self.pattern(p="rdf:type").join(subs, on="object")
                .select("subject").distinct())

    def ordered_list(self, p: str) -> DataFrame:
        """p/rdf:rest*/rdf:first equivalent — unroll the idx-encoded
        list into per-subject ordered arrays (W2)."""
        from mms_rdf_spark.plans.closure import unroll_lists

        return unroll_lists(self.pattern(p=p))

    def rest_star_first(self, p: str | None = None) -> DataFrame:
        """The LITERAL `p/rdf:rest*/rdf:first` walk over a graph in
        RDF-collection form (the reference notebook's deadlock query,
        tmt-demo.ipynb cell 11): returns (subject, predicate, object,
        idx) for every list member, positions recovered by the
        pointer-doubling chain walk. Use `ordered_list` when the graph
        carries the idx encoding instead."""
        from mms_rdf_spark.operators.collections import unroll_collections

        out = unroll_collections(self.t).where(F.col("idx").isNotNull())
        if p is not None:
            out = out.where(F.col("predicate") == p)
        return out.select("subject", "predicate", "object", "idx")


# --- Gremlin-style traversal over the LPG view ---------------------
class Traversal:
    """g.V().out/in_/both analog over the LPG edges DataFrame
    (reference notebooks/tmt-demo-gremlin.ipynb cells 3-8). Each hop is
    an equi-join on the frontier; label filters prune before joining."""

    def __init__(self, edges: DataFrame, frontier: DataFrame):
        self.edges = edges
        self.frontier = frontier  # one column: ~id

    @classmethod
    def V(cls, edges: DataFrame, ids: list[str] | None = None) -> "Traversal":
        nodes = (edges.select(F.col("~from").alias("~id"))
                 .union(edges.select(F.col("~to").alias("~id"))).distinct())
        if ids:
            nodes = nodes.where(F.col("~id").isin(ids))
        return cls(edges, nodes)

    def _hop(self, src: str, dst: str, label: str | None) -> "Traversal":
        e = self.edges if label is None \
            else self.edges.where(F.col("~label") == label)
        nxt = (self.frontier
               .join(e, self.frontier["~id"] == e[src])
               .select(F.col(dst).alias("~id")).distinct())
        return Traversal(self.edges, nxt)

    def out(self, label: str | None = None) -> "Traversal":
        return self._hop("~from", "~to", label)

    def in_(self, label: str | None = None) -> "Traversal":
        return self._hop("~to", "~from", label)

    def both(self, label: str | None = None) -> "Traversal":
        a = self._hop("~from", "~to", label).frontier
        b = self._hop("~to", "~from", label).frontier
        return Traversal(self.edges, a.union(b).distinct())

    def repeat(self, hop: str = "out", times: int = 1,
               label: str | None = None) -> "Traversal":
        """g.V().repeat(out()).times(n) analog — a fixed-depth loop
        unrolled at plan time into n equi-joins (no runtime recursion;
        unbounded repeat is `plans.closure.transitive_closure`)."""
        steps = {"out": Traversal.out, "in": Traversal.in_,
                 "in_": Traversal.in_, "both": Traversal.both}
        if hop not in steps:
            raise ValueError(f"hop must be one of {sorted(steps)}: {hop!r}")
        t = self
        for _ in range(times):
            t = steps[hop](t, label)
        return t

    def values_map(self, nodes: DataFrame) -> DataFrame:
        """g.V().propertiesMap() analog: join the frontier against the
        LPG nodes table (one column per literal-bearing predicate,
        reference tmt-demo-gremlin.ipynb cell 8)."""
        return self.frontier.join(nodes, on="~id", how="left")

    def to_df(self) -> DataFrame:
        return self.frontier


# ---------------------------------------------------------------------
# sparql_select: a SPARQL SELECT string front-end over the same
# relational compilation the Graph helpers use. Lets a reference user
# paste the notebook/endpoint queries (src/action/query.js delegates
# these to Fuseki/Neptune) and run them on Catalyst directly.
#
# Supported grammar (documented subset):
#   SELECT [DISTINCT] ?a ?b | * [WHERE]
#   { <triple patterns '.'-terminated; `;` predicate-object lists;
#      `a` keyword for rdf:type; sequence paths p1/p2; closure
#      paths p* / p+, also as path steps (a/rdfs:subClassOf*);
#      inverse paths ^p (also ^p/q sequences, ^p+ closures);
#      alternation p1|p2 (elements may carry ^/*/+; not mixed with
#      `/` inside one alternation); negated property sets !p and
#      !(p1|p2) (forward-only elements)>
#     OPTIONAL { <one-or-more patterns> }
#     FILTER NOT EXISTS { <patterns> }   FILTER EXISTS { <patterns> }
#     MINUS { <patterns> }
#     VALUES ?v { term term ... }
#     BIND(expr AS ?v)   expr in: ?x | literal | ?x <+-*/> term |
#       CONCAT(t, ...) | STRLEN(?x) | UCASE(?x) | LCASE(?x) | STR(?x) |
#       SUBSTR(?x, s[, l]) (1-based) | STRBEFORE/STRAFTER(?x, "sep")
#       ("" when absent, XPath) | REPLACE(?x, "re", "rep"[, "i"])
#     FILTER (expr) — boolean expressions over the primitives below,
#       composed with ! / && / || and parentheses (SPARQL precedence);
#       primitives: ?v <op> term-or-?var (op in = != < > <= >=),
#       regex(?v, "re"[, "i"]), STRSTARTS|STRENDS|CONTAINS(?v, "lit"),
#       ?v [NOT] IN (term, ...) (lexical), BOUND(?v) (pairs with
#       OPTIONAL). Unparseable FILTERs raise — never silently dropped
#     { SELECT ... }  — subquery; joins the group on its PROJECTED
#       variables only (SPARQL subquery scoping); any unsupported
#       FILTER form raises (never silently dropped)
#     { A } UNION { B }  — whole-body (unrestricted branches) or
#       mixed with other patterns (plain-FILTER branches) }
#   GROUP BY ?g   HAVING (AGG(?v) <op> term [&& ...] | ?alias <op> term)
#   ORDER BY ?v [DESC] [, ...]   LIMIT n   OFFSET m
#   BIND additionally: COALESCE(t, ...) | IF(?v <op> term, t, t)
# Terms: ?var, "quoted literal", bare IRIs (prefixed form), numbers.
# Each pattern compiles to a filtered scan; patterns join naturally on
# shared variables (Catalyst reorders/broadcasts); OPTIONAL becomes a
# left outer join on the shared variables; FILTER NOT EXISTS is a
# left-anti join on the shared variables (the reference's own amend
# query, src/action/ammend.js:35-38); MINUS is the same left-anti but
# is a NO-OP when the inner pattern shares no variable (per SPARQL's
# incompatible-domains rule — the one observable place MINUS and
# NOT EXISTS diverge in this subset); VALUES is an isin filter
# (tmt-demo.ipynb cells 5/19); closure paths compile through
# plans.closure.transitive_closure (triplifier.js:453-455
# `rdfs:subClassOf*`) — `+` is the transitive pairs, `*` adds the
# zero-hop identity over every graph term, per SPARQL. Inverse `^p`
# swaps the pattern's endpoints before compilation (so `^a/b` splits
# into (^a)/b hops, SPARQL's precedence); alternation unions the
# per-element bindings frames WITHOUT dedup (SPARQL path alternation
# is a bag union). BINDs apply in textual order AFTER the BGP join
# (a BIND var may feed later BINDs, filters, projection, ORDER BY —
# not later triple patterns; arithmetic applies xsd numeric promotion
# i.e. cast to double). FILTERs apply post-join; a ?var right-hand
# side compares the two bindings as strings (the store is untyped
# lexical forms). Patterns with no shared vars cross-join (as SPARQL
# semantics demand) — at scale that is the query author's
# responsibility, same as on any endpoint.
#
# Scale note on closure paths: the closure is computed over the
# FULL p-edge set and then filtered by any bound endpoint. For huge
# graphs with a bound source, seed a frontier walk instead
# (operators.pagerank.bfs_layers / plans.closure) — the embedded
# reference shapes all close over vocabulary-sized hierarchies.

import re as _re


def _split_statements(chunk: str) -> list[list[str]]:
    """'.'-separated statements, each optionally a `;` predicate-object
    list (Turtle/SPARQL shorthand, used throughout the reference's
    notebook queries): `?s a X ; p ?o ; .` -> [[?s a X], [?s p ?o]]."""
    stmts = []
    for stmt in [s.strip() for s in chunk.split(" .") if s.strip()]:
        parts = [p.strip() for p in stmt.split(";")]
        head = parts[0].split()
        if len(head) != 3:
            raise ValueError(f"bad triple pattern: {parts[0]!r}")
        stmts.append(head)
        for cont in parts[1:]:
            if not cont:
                continue  # trailing `;` before the closing `.`
            po = cont.split()
            if len(po) != 2:
                raise ValueError(f"bad predicate-object pair: {cont!r}")
            stmts.append([head[0], po[0], po[1]])
    return stmts


def _expand_paths(stmts: list[list[str]]) -> list[list[str]]:
    """Sequence property paths: `?s p1/p2 ?o` rewrites to
    `?s p1 ?_ppK . ?_ppK p2 ?o` with fresh intermediate variables —
    each hop then compiles like any other pattern (one equi-join per
    path step, exactly what an endpoint's BGP optimizer does).
    Closure markers (`*`/`+`) survive on the individual step and are
    compiled by `_compile_one`."""
    out, k = [], 0
    for s, p, o in stmts:
        if not p.startswith("?") and "/" in p:
            steps = p.split("/")
            cur = s
            for step in steps[:-1]:
                mid = f"?_pp{k}"
                k += 1
                out.append([cur, step, mid])
                cur = mid
            out.append([cur, steps[-1], o])
        else:
            out.append([s, p, o])
    return out


def _closure_frame(triples: DataFrame, pred: str,
                   star: bool) -> DataFrame:
    """(subject, object) pairs of the `pred+` transitive closure;
    `star` adds the zero-length path — identity over every graph term,
    per SPARQL's zero-or-more semantics (the identity branch prunes to
    a semi-join once the caller binds either endpoint)."""
    from mms_rdf_spark.plans.closure import transitive_closure

    edges = (triples.where(F.col("predicate") == pred)
             .select("subject", "object"))
    pairs = transitive_closure(edges, "subject", "object",
                               reflexive=False)
    if star:
        nodes = (triples.select("subject")
                 .union(triples.select(F.col("object").alias("subject")))
                 .distinct())
        pairs = pairs.union(
            nodes.select("subject", F.col("subject").alias("object"))
        ).distinct()
    return pairs


def _compile_one(triples: DataFrame, terms: list[str]) -> DataFrame:
    """One (possibly closure/inverse/alternation) triple pattern -> a
    bindings frame with one column per free variable."""
    s, p, o = terms
    if p == "a":
        p = "rdf:type"
    if not p.startswith("?"):
        if p.startswith("!"):
            # negated property set !p / !(p1|p2): any predicate NOT in
            # the set (forward-only subset — no ^-elements inside !)
            inner = p[1:]
            if inner.startswith("(") and inner.endswith(")"):
                inner = inner[1:-1]
            preds = ["rdf:type" if x.strip() == "a" else x.strip()
                     for x in inner.split("|")]
            df = triples.where(~F.col("predicate").isin(preds))
            cols = {}
            for colname, term in zip(("subject", "object"), (s, o)):
                if term.startswith("?"):
                    cols[colname] = term[1:]
                else:
                    lit = term[1:-1] if term.startswith('"') else term
                    df = df.where(F.col(colname) == lit)
            return df.select(
                *[F.col(c).alias(v) for c, v in cols.items()])
        if p.startswith("^"):
            # inverse path: swap the endpoints, compile the rest
            # (handles ^p, ^p+, ^(a|b) via recursion)
            return _compile_one(triples, [o, p[1:], s])
        core = p[1:-1] if (p.startswith("(") and p.endswith(")")
                           and "(" not in p[1:-1]) else p
        if "|" in core:
            # path alternation: bag union of the per-element frames
            # (same endpoint terms -> same columns); each element may
            # itself be inverse/closure
            outs = [_compile_one(triples, [s, alt.strip(), o])
                    for alt in core.split("|")]
            out = outs[0]
            for x in outs[1:]:
                out = out.unionByName(x)
            return out
    if not p.startswith("?") and p.endswith("?"):
        # zero-or-one path p?: identity over every graph term plus the
        # direct edges (SPARQL 1.1 §9.1 ZeroOrOnePath) — the closure
        # machinery without the transitive part
        edges = (triples.where(F.col("predicate") == p[:-1])
                 .select("subject", "object"))
        nodes = (triples.select("subject")
                 .union(triples.select(F.col("object").alias("subject")))
                 .distinct())
        df = edges.union(
            nodes.select("subject", F.col("subject").alias("object"))
        ).distinct()
        cols = {}
        for colname, term in (("subject", s), ("object", o)):
            if term.startswith("?"):
                cols[colname] = term[1:]
            else:
                lit = term[1:-1] if term.startswith('"') else term
                df = df.where(F.col(colname) == lit)
        return df.select(*[F.col(c).alias(v) for c, v in cols.items()])
    if not p.startswith("?") and p[-1] in "*+":
        df = _closure_frame(triples, p[:-1], star=p.endswith("*"))
        cols = {}
        for colname, term in (("subject", s), ("object", o)):
            if term.startswith("?"):
                cols[colname] = term[1:]
            else:
                lit = term[1:-1] if term.startswith('"') else term
                df = df.where(F.col(colname) == lit)
        return df.select(*[F.col(c).alias(v) for c, v in cols.items()])
    df, cols = triples, {}
    for colname, term in zip(("subject", "predicate", "object"),
                             (s, p, o)):
        if term.startswith("?"):
            cols[colname] = term[1:]
        else:
            lit = term[1:-1] if term.startswith('"') else term
            df = df.where(F.col(colname) == lit)
    return df.select(*[F.col(c).alias(v) for c, v in cols.items()])


def _compile_graph_block(quads: DataFrame, gterm: str,
                         gbody: str) -> DataFrame:
    """One `GRAPH <g> { ... }` / `GRAPH ?g { ... }` block over a QUADS
    frame (a triples frame with a `graph` column — the named-graph
    model the reference drives: per-project graphs, clear.js:12,
    Neptune's namedGraphUri, update-neptune.js:85). Patterns OUTSIDE
    a GRAPH block match all rows (the union-default-graph config most
    endpoints run). `GRAPH ?g` compiles the body once per distinct
    graph name and unions with the name bound — the graph list is a
    bounded driver fold (named graphs are projects/refs,
    administratively small, never data-proportional)."""
    if "graph" not in quads.columns:
        raise ValueError(
            "GRAPH pattern requires a quads frame with a 'graph' column")
    if gterm.startswith("?"):
        var = gterm[1:]
        names = sorted(
            r["graph"]
            for r in quads.select("graph")
            .where(F.col("graph").isNotNull()).distinct().collect())
        frames = [
            _compile_patterns(quads.where(F.col("graph") == g), gbody)
            .withColumn(var, F.lit(g))
            for g in names]
        if not frames:
            raise ValueError("GRAPH ?var: store has no named graphs")
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out
    g = gterm[1:-1] if (gterm.startswith("<")
                        and gterm.endswith(">")) else gterm
    return _compile_patterns(quads.where(F.col("graph") == g), gbody)


def _compile_patterns(triples: DataFrame, chunk: str) -> DataFrame | None:
    out = None
    for terms in _expand_paths(_split_statements(chunk)):
        hop = _compile_one(triples, terms)
        if out is None:
            out = hop
        else:
            shared = sorted(set(out.columns) & set(hop.columns))
            out = out.join(hop, on=shared) if shared \
                else out.crossJoin(hop)
    return out


def _extract_binds(body: str) -> tuple[str, list[tuple[str, str]]]:
    """Pull `BIND(expr AS ?v)` clauses out of a group body (balanced-
    paren scan — CONCAT(...) nests), returning the stripped body and
    the (expr, var) list in textual order."""
    binds: list[tuple[str, str]] = []
    while True:
        m = _re.search(r"BIND ?\(", body, _re.I)
        if not m:
            return body, binds
        depth, j = 1, m.end()
        while depth and j < len(body):
            if body[j] == "(":
                depth += 1
            elif body[j] == ")":
                depth -= 1
            j += 1
        if depth:
            raise ValueError("unbalanced parens in BIND")
        inner = body[m.end():j - 1].strip()
        em = _re.match(r"(.*) AS \?(\w+)$", inner, _re.I)
        if not em:
            raise ValueError(f"unparseable BIND: {inner!r}")
        binds.append((em.group(1).strip(), em.group(2)))
        rest = body[j:]
        if rest.startswith(" ."):
            rest = rest[2:]  # BIND may be '.'-terminated like a pattern
        body = body[:m.start()] + " " + rest


def _extract_filters(body: str) -> tuple[str, list[str]]:
    """Lift plain FILTER expressions out of a group body (balanced-
    paren scan — FILTER NOT EXISTS / FILTER EXISTS were removed
    earlier). Returns the stripped body and the expression texts,
    e.g. '(?a > 3 && regex(?n, "x"))' or 'regex(?n, "x")'."""
    out: list[str] = []
    while True:
        m = _re.search(r"\bFILTER\b ?", body, _re.I)
        if not m:
            return body, out
        i = body.find("(", m.end())
        if i < 0:
            raise ValueError(
                f"FILTER without parentheses near: "
                f"{body[m.start():m.start() + 40]!r}")
        depth, j = 1, i + 1
        while depth and j < len(body):
            if body[j] == "(":
                depth += 1
            elif body[j] == ")":
                depth -= 1
            j += 1
        if depth:
            raise ValueError("unbalanced parens in FILTER")
        out.append(body[m.end():j].strip())
        rest = body[j:]
        if rest.startswith(" ."):
            rest = rest[2:]
        body = body[:m.start()] + " " + rest


def _split_bool(s: str, op: str) -> list[str]:
    """Top-level split on a two-char boolean operator (&& or ||),
    honoring quotes and nested parens."""
    parts: list[str] = []
    cur: list[str] = []
    depth, inq, i = 0, False, 0
    while i < len(s):
        ch = s[i]
        if ch == '"':
            inq = not inq
        if not inq:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0 and s[i:i + 2] == op:
                parts.append("".join(cur))
                cur = []
                i += 2
                continue
        cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return [p.strip() for p in parts]


def _strip_whole_parens(e: str) -> str:
    while e.startswith("(") and e.endswith(")"):
        depth = 0
        for j, ch in enumerate(e):
            depth += ch == "("
            depth -= ch == ")"
            if depth == 0 and j < len(e) - 1:
                return e  # the leading paren closes early
        e = e[1:-1].strip()
    return e


def _filter_expr(e: str):
    """Compile a FILTER boolean expression to a Column: primitives
    (comparisons, regex, STRSTARTS/STRENDS/CONTAINS, [NOT] IN,
    BOUND) composed with !, &&, || and parentheses — SPARQL's
    operator precedence (! > && > ||)."""
    e = _strip_whole_parens(e.strip())
    ors = _split_bool(e, "||")
    if len(ors) > 1:
        col = _filter_expr(ors[0])
        for part in ors[1:]:
            col = col | _filter_expr(part)
        return col
    ands = _split_bool(e, "&&")
    if len(ands) > 1:
        col = _filter_expr(ands[0])
        for part in ands[1:]:
            col = col & _filter_expr(part)
        return col
    return _filter_prim(e)


def _filter_prim(e: str):
    e = e.strip()
    if e.startswith("!") and not e.startswith("!="):
        return ~_filter_expr(e[1:])
    m = _re.fullmatch(r"BOUND ?\( ?\?(\w+) ?\)", e, _re.I)
    if m:
        return F.col(m.group(1)).isNotNull()
    m = _re.fullmatch(
        r"regex\( ?\?(\w+) ?, ?\"([^\"]*)\" ?(?:, ?\"([a-z]*)\" ?)?\)",
        e, _re.I)
    if m:
        var, pat, flags = m.groups()
        if flags and "i" in flags:
            pat = "(?i)" + pat
        return F.col(var).rlike(pat)
    m = _re.fullmatch(
        r"(STRSTARTS|STRENDS|CONTAINS)\( ?\?(\w+) ?, ?\"([^\"]*)\" ?\)",
        e, _re.I)
    if m:
        fn, var, lit = m.groups()
        c = F.col(var)
        return {"STRSTARTS": c.startswith(lit),
                "STRENDS": c.endswith(lit),
                "CONTAINS": c.contains(lit)}[fn.upper()]
    m = _re.fullmatch(r"\?(\w+) (NOT )?IN ?\((.*)\)", e, _re.I)
    if m:
        var, neg, inline = m.groups()
        vals = [t[1:-1] if t.startswith('"') else t
                for t in _split_args(inline)]
        # NOT IN on an unbound (NULL) var is a SPARQL type error ->
        # row dropped; Spark's NULL-propagating ~isin matches that
        cond = F.col(var).isin(vals)
        return ~cond if neg else cond
    m = _re.fullmatch(r"\?(\w+) ?(!=|<=|>=|=|<|>) ?(.+)", e)
    if m:
        var, op, term = m.groups()
        term = term.strip()
        if term.startswith("?"):
            rhs, col = F.col(term[1:]), F.col(var)
        elif term.startswith('"'):
            rhs, col = F.lit(term[1:-1]), F.col(var)
        elif _re.fullmatch(r"-?\d+(\.\d+)?", term):
            rhs, col = F.lit(float(term)), F.col(var).cast("double")
        else:
            rhs, col = F.lit(term), F.col(var)
        return {"=": col == rhs, "!=": col != rhs, "<": col < rhs,
                ">": col > rhs, "<=": col <= rhs,
                ">=": col >= rhs}[op]
    raise ValueError(f"unsupported FILTER form: {e!r}")


def _extract_subselects(body: str) -> tuple[str, list[str]]:
    """Lift `{ SELECT ... }` subqueries out of a group body (balanced-
    brace scan — the subquery's own WHERE block nests), returning the
    stripped body and the inner SELECT texts in textual order."""
    subs: list[str] = []
    while True:
        m = _re.search(r"\{ ?SELECT\b", body, _re.I)
        if not m:
            return body, subs
        i = m.start()
        depth, j = 1, i + 1
        while depth and j < len(body):
            if body[j] == "{":
                depth += 1
            elif body[j] == "}":
                depth -= 1
            j += 1
        if depth:
            raise ValueError("unbalanced braces in subquery")
        subs.append(body[i + 1:j - 1].strip())
        body = body[:i] + " " + body[j:]


def _split_args(s: str) -> list[str]:
    """Top-level comma split, honoring quotes and nested parens."""
    args, cur, depth, inq = [], [], 0, False
    for ch in s:
        if ch == '"':
            inq = not inq
            cur.append(ch)
        elif inq:
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            args.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    args.append("".join(cur))
    return [a.strip() for a in args if a.strip()]


def _bind_term(t: str) -> Column:
    t = t.strip()
    if t.startswith("?"):
        return F.col(t[1:])
    if t.startswith('"'):
        return F.lit(t[1:-1])
    if _re.fullmatch(r"-?\d+", t):
        return F.lit(int(t)).cast("long")
    if _re.fullmatch(r"-?\d+\.\d+", t):
        return F.lit(float(t))
    return F.lit(t)  # bare IRI


def _bind_expr(expr: str) -> Column:
    """Compile the documented BIND expression subset to a Column.
    Arithmetic applies SPARQL's xsd numeric promotion (double);
    string builtins keep their spec types (STRLEN -> integer)."""
    e = expr.strip()
    while e.startswith("(") and e.endswith(")") and "(" not in e[1:-1]:
        e = e[1:-1].strip()
    fm = _re.match(r"(CONCAT|STRLEN|UCASE|LCASE|STR|COALESCE|IF|"
                   r"SUBSTR|STRBEFORE|STRAFTER|REPLACE) ?"
                   r"\((.*)\)$", e, _re.I)
    if fm:
        fn, raw = fm.group(1).upper(), _split_args(fm.group(2))
        if fn == "IF":
            # IF(cond, then, else): cond subset `?v <op> term` (the
            # FILTER comparison grammar); branches are plain terms
            cm = _re.match(r"\?(\w+) ?(!=|<=|>=|=|<|>) ?(.+)$", raw[0])
            if not cm or len(raw) != 3:
                raise ValueError(f"unparseable IF: {e!r}")
            var, op, term = cm.groups()
            lhs, rhs = F.col(var), _bind_term(term)
            if _re.fullmatch(r"-?\d+(\.\d+)?", term.strip()):
                lhs, rhs = lhs.cast("double"), rhs.cast("double")
            cond = {"=": lhs == rhs, "!=": lhs != rhs, "<": lhs < rhs,
                    ">": lhs > rhs, "<=": lhs <= rhs,
                    ">=": lhs >= rhs}[op]
            # NULL condition (unbound var) leaves the IF unbound per
            # SPARQL's error propagation — hence two whens, no otherwise
            return F.when(cond, _bind_term(raw[1])) \
                .when(~cond, _bind_term(raw[2]))
        args = [_bind_term(a) for a in raw]
        if fn == "SUBSTR":
            # SPARQL/XPath 1-based; without length, to end of string
            length = (args[2].cast("int") if len(raw) > 2
                      else F.lit(2147483647))
            return F.substring(args[0], args[1].cast("int"), length)
        if fn == "STRBEFORE":
            # "" when the separator does not occur (XPath semantics)
            pos = F.instr(args[0], raw[1].strip()[1:-1])
            return F.when(pos > 0,
                          F.substring(args[0], F.lit(1), pos - 1)) \
                .otherwise(F.lit(""))
        if fn == "STRAFTER":
            sep = raw[1].strip()[1:-1]
            pos = F.instr(args[0], sep)
            return F.when(pos > 0,
                          F.substring(args[0], pos + len(sep),
                                      F.lit(2147483647))) \
                .otherwise(F.lit(""))
        if fn == "REPLACE":
            # regex semantics per spec; optional "i" flag
            pat = raw[1].strip()[1:-1]
            if len(raw) > 3 and "i" in raw[3].strip()[1:-1].lower():
                pat = "(?i)" + pat
            return F.regexp_replace(args[0], pat,
                                    raw[2].strip()[1:-1])
        if fn == "CONCAT":
            return F.concat(*args)
        if fn == "STRLEN":
            return F.length(args[0]).cast("long")
        if fn == "UCASE":
            return F.upper(args[0])
        if fn == "LCASE":
            return F.lower(args[0])
        if fn == "COALESCE":
            return F.coalesce(*args)
        return args[0].cast("string")  # STR
    am = _re.match(r"(\S+) ?([+*/-]) ?(\S+)$", e)
    if am:
        left = _bind_term(am.group(1)).cast("double")
        right = _bind_term(am.group(3)).cast("double")
        return {"+": left + right, "-": left - right,
                "*": left * right, "/": left / right}[am.group(2)]
    return _bind_term(e)


def sparql_select(triples: DataFrame, query: str) -> DataFrame:
    """Run a SPARQL SELECT (subset above, plus aggregates and UNION)
    over a triples DataFrame.

    Aggregates: `SELECT ?g (COUNT(?x) AS ?n) ... GROUP BY ?g` with
    COUNT / COUNT(DISTINCT ?x) / MIN / MAX (SPARQL string semantics:
    min/max are lexicographic, like an endpoint's) / SUM / AVG (xsd
    numeric promotion) / SAMPLE (deterministic: min) / GROUP_CONCAT
    (deterministic: sorted; `; SEPARATOR="x"` honored, default a
    space). Aggregates without GROUP BY use SPARQL's implicit single
    group. UNION: `{ A } UNION { B }` unions the branch bindings by
    name (missing vars on a branch bind NULL, per SPARQL).

    The reference's own embedded query shapes all parse verbatim:
    the amend dangling-element query (ammend.js:35-38 — property-path
    `a/rdfs:subClassOf*`, `filter(...)`, `filter not exists {...}`),
    and the tmt-demo notebook cells (`a` keyword, `;` predicate-object
    lists, `values ?v {...}`, bare `select ... { }` with no WHERE)."""
    q = _re.sub(r"\s+", " ", query).strip()
    # LIMIT/OFFSET may appear in either order (SPARQL LimitOffsetClauses);
    # pre-extract OFFSET so the main grammar regex stays linear
    offset = None
    off_m = _re.search(r" OFFSET (\d+)", q, _re.I)
    if off_m:
        offset = int(off_m.group(1))
        q = q[:off_m.start()] + q[off_m.end():]
    m = _re.match(
        r"SELECT (DISTINCT )?(.+?) (?:WHERE )?\{(.*)\}"
        r"(?: GROUP BY (.+?))?(?: HAVING (.+?))?"
        r"(?: ORDER BY (.+?))?(?: LIMIT (\d+))? ?$",
        q, _re.I)
    if not m:
        raise ValueError("unparseable SPARQL SELECT")
    distinct, proj, body, group, having, order, limit = m.groups()

    union_m = _re.match(r" ?\{(.*)\} UNION \{(.*)\} ?$", body, _re.I)
    if union_m and not _re.search(r"\{ ?SELECT\b", body, _re.I):
        left = sparql_select(
            triples, f"SELECT * WHERE {{{union_m.group(1)}}}")
        right = sparql_select(
            triples, f"SELECT * WHERE {{{union_m.group(2)}}}")
        out = left.unionByName(right, allowMissingColumns=True)
        return _finish_select(out, distinct, proj, group, order, limit,
                              offset, having)

    # Subqueries `{ SELECT ... }` lift out FIRST (balanced-brace scan —
    # their bodies contain `{...}` that would break the flat regexes
    # below); each compiles via recursion and joins the rest of the
    # group on its PROJECTED variables only, per SPARQL's subquery
    # scoping (inner non-projected vars are invisible outside).
    body, subselects = _extract_subselects(body)

    # GRAPH blocks lift before the brace-consuming rewrites below
    # (their `{...}` would be eaten by the UNION/OPTIONAL regexes);
    # each compiles against the named slice and joins conjunctively
    graph_blocks = _re.findall(r"GRAPH (\S+) \{([^}]*)\}", body, _re.I)
    body = _re.sub(r"GRAPH \S+ \{[^}]*\}", " ", body, flags=_re.I)

    # UNION groups MIXED with other patterns: each `{A} UNION {B}`
    # segment compiles via recursion (branches may carry plain
    # FILTER()/regex/BIND/VALUES but not brace-nested clauses —
    # OPTIONAL, NOT EXISTS, nested unions) and joins the rest of the
    # group on shared variables, like any other pattern frame. Join
    # keys must be bound in both branches (unbound-compatible join
    # semantics are outside this subset). A whole-body union (above)
    # keeps the unrestricted-branch path.
    union_segs = _re.findall(
        r"\{([^{}]*)\} UNION \{([^{}]*)\}", body, _re.I)
    body = _re.sub(r"\{[^{}]*\} UNION \{[^{}]*\}", " ", body, flags=_re.I)

    not_exists = [g.strip() for g in _re.findall(
        r"FILTER NOT EXISTS \{([^}]*)\}", body, _re.I)]
    body = _re.sub(r"FILTER NOT EXISTS \{[^}]*\}", " ", body,
                   flags=_re.I)
    exists_blocks = [g.strip() for g in _re.findall(
        r"FILTER EXISTS \{([^}]*)\}", body, _re.I)]
    body = _re.sub(r"FILTER EXISTS \{[^}]*\}", " ", body, flags=_re.I)
    minus_blocks = [g.strip() for g in _re.findall(
        r"MINUS \{([^}]*)\}", body, _re.I)]
    body = _re.sub(r"MINUS \{[^}]*\}", " ", body, flags=_re.I)
    optionals = [g.strip() for g in
                 _re.findall(r"OPTIONAL \{([^}]*)\}", body, _re.I)]
    body = _re.sub(r"OPTIONAL \{[^}]*\}", " ", body, flags=_re.I)
    body, binds = _extract_binds(body)
    values_blocks = _re.findall(
        r"VALUES \?(\w+) \{([^}]*)\}", body, _re.I)
    body = _re.sub(r"VALUES \?\w+ \{[^}]*\}", " ", body, flags=_re.I)
    # every remaining FILTER lifts here (balanced scan); an
    # unparseable expression raises in _filter_prim — a constraint is
    # NEVER silently dropped (superset-result landmine)
    body, filter_exprs = _extract_filters(body)

    out = _compile_patterns(triples, body) \
        if body.strip().strip(".").strip() else None
    for left_s, right_s in union_segs:
        u = sparql_select(
            triples, f"SELECT * WHERE {{{left_s}}}").unionByName(
            sparql_select(triples, f"SELECT * WHERE {{{right_s}}}"),
            allowMissingColumns=True)
        if out is None:
            out = u
        else:
            shared = sorted(set(out.columns) & set(u.columns))
            out = out.join(u, on=shared) if shared else out.crossJoin(u)
    for sub in subselects:
        frame = sparql_select(triples, sub)
        if out is None:
            out = frame
        else:
            shared = sorted(set(out.columns) & set(frame.columns))
            out = out.join(frame, on=shared) if shared \
                else out.crossJoin(frame)
    for gterm, gbody in graph_blocks:
        frame = _compile_graph_block(triples, gterm, gbody)
        if out is None:
            out = frame
        else:
            shared = sorted(set(out.columns) & set(frame.columns))
            out = out.join(frame, on=shared) if shared \
                else out.crossJoin(frame)
    if out is None:
        raise ValueError("WHERE has no required patterns")
    for opt in optionals:
        hop = _compile_patterns(triples, opt)
        shared = sorted(set(out.columns) & set(hop.columns))
        if not shared:
            raise ValueError("OPTIONAL shares no variable")
        out = out.join(hop, on=shared, how="left")
    for ne in not_exists:
        inner = _compile_patterns(triples, ne)
        shared = sorted(set(out.columns) & set(inner.columns))
        if not shared:
            raise ValueError("FILTER NOT EXISTS shares no variable")
        out = out.join(inner.select(*shared), on=shared, how="left_anti")
    for ex in exists_blocks:
        inner = _compile_patterns(triples, ex)
        shared = sorted(set(out.columns) & set(inner.columns))
        if not shared:
            raise ValueError("FILTER EXISTS shares no variable")
        out = out.join(inner.select(*shared), on=shared, how="left_semi")
    for mb in minus_blocks:
        inner = _compile_patterns(triples, mb)
        shared = sorted(set(out.columns) & set(inner.columns))
        if not shared:
            continue  # disjoint domains: MINUS removes nothing (spec)
        out = out.join(inner.select(*shared), on=shared, how="left_anti")
    for expr, var in binds:
        out = out.withColumn(var, _bind_expr(expr))
    for var, inline in values_blocks:
        vals = [t[1:-1] if t.startswith('"') else t
                for t in inline.split()]
        out = out.where(F.col(var).isin(vals))

    for fe in filter_exprs:
        out = out.where(_filter_expr(fe))

    return _finish_select(out, distinct, proj, group, order, limit,
                          offset, having)


_AGG_RE = _re.compile(
    r"\( ?(COUNT|MIN|MAX|SUM|AVG|SAMPLE|GROUP_CONCAT)"
    r"\( ?(DISTINCT )?\?(\w+) ?"
    r"(?:; ?SEPARATOR ?= ?\"([^\"]*)\" ?)?\) AS \?(\w+) ?\)"
    r"|\?(\w+)", _re.I)


def _agg_expr(fn: str, dis, var: str, sep) -> Column:
    """One SPARQL aggregate -> a Catalyst aggregate expression.
    COUNT/MIN/MAX keep SPARQL string semantics; SUM/AVG apply xsd
    numeric promotion (cast to double); SAMPLE picks the minimum
    (any value is spec-legal — min is the deterministic choice, so
    results hash-match across engines); GROUP_CONCAT sorts the
    collected values before joining for the same reason (SPARQL leaves
    the order undefined; default separator is a single space per
    spec)."""
    fn = fn.upper()
    if fn == "COUNT":
        return (F.countDistinct(var) if dis
                else F.count(var)).cast("long")
    if fn == "MIN":
        return F.min(var)   # SPARQL string semantics
    if fn == "MAX":
        return F.max(var)
    if fn == "SUM":
        col = F.col(var).cast("double")
        return F.sum_distinct(col) if dis else F.sum(col)
    if fn == "AVG":
        col = F.col(var).cast("double")
        return F.avg(col)
    if fn == "SAMPLE":
        return F.min(var)
    # GROUP_CONCAT
    collected = F.collect_set(var) if dis else F.collect_list(var)
    return F.array_join(F.array_sort(collected),
                        sep if sep is not None else " ")


def _having_conds(having: str, aliases: set[str]):
    """HAVING conditions (`&&`-joined) -> (extra hidden agg exprs,
    post-agg predicate builders). Each condition is either an
    aggregate comparison `AGG(?v) <op> term` (aggregate computed as a
    hidden column, dropped after the filter) or a comparison against a
    SELECT-projected aggregate alias `?alias <op> term`."""
    def _strip_outer(s: str) -> str:
        s = s.strip()
        while s.startswith("(") and s.endswith(")"):
            depth = 0
            for j, ch in enumerate(s):
                depth += ch == "("
                depth -= ch == ")"
                if depth == 0 and j < len(s) - 1:
                    return s  # the leading paren closes early
            s = s[1:-1].strip()
        return s

    extra, preds = [], []
    for i, cond in enumerate(
            _strip_outer(c) for c in _strip_outer(having).split("&&")):
        am = _re.match(
            r"(COUNT|MIN|MAX|SUM|AVG)\( ?(DISTINCT )?\?(\w+) ?\)"
            r" ?(!=|<=|>=|=|<|>) ?(.+)$", cond, _re.I)
        if am:
            fn, dis, var, op, term = am.groups()
            col = f"_hv{i}"
            extra.append(_agg_expr(fn, dis, var, None).alias(col))
        else:
            vm = _re.match(r"\?(\w+) ?(!=|<=|>=|=|<|>) ?(.+)$", cond)
            if not vm or vm.group(1) not in aliases:
                raise ValueError(f"unsupported HAVING: {cond!r}")
            col, op, term = vm.groups()
        term = term.strip()
        if _re.fullmatch(r"-?\d+(\.\d+)?", term):
            lhs, rhs = F.col(col).cast("double"), F.lit(float(term))
        else:
            lhs = F.col(col)
            rhs = F.lit(term[1:-1] if term.startswith('"') else term)
        preds.append({"=": lhs == rhs, "!=": lhs != rhs, "<": lhs < rhs,
                      ">": lhs > rhs, "<=": lhs <= rhs,
                      ">=": lhs >= rhs}[op])
    return extra, preds


def _split_proj_items(proj: str) -> list[str]:
    """SELECT-clause items split at top level: `?v` vars and
    `(expr AS ?v)` expressions (parens/quotes honored)."""
    items: list[str] = []
    cur: list[str] = []
    depth, inq = 0, False
    for ch in proj:
        if ch == '"':
            inq = not inq
        if not inq:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == " " and depth == 0:
                if cur:
                    items.append("".join(cur))
                    cur = []
                continue
        cur.append(ch)
    if cur:
        items.append("".join(cur))
    return items


def _finish_select(out: DataFrame, distinct, proj, group, order,
                   limit, offset=None, having=None) -> DataFrame:
    proj = proj.strip()
    has_agg = bool(_re.search(
        r"\b(COUNT|MIN|MAX|SUM|AVG|SAMPLE|GROUP_CONCAT) ?\(", proj,
        _re.I))
    if (not group and not has_agg and "(" in proj and proj != "*"):
        # projection expressions (SPARQL 1.1 SelectClause):
        # `SELECT ?a (expr AS ?v) ...` — expr in the BIND subset;
        # not mixable with aggregates (use BIND + GROUP BY for that)
        cols = []
        for it in _split_proj_items(proj):
            if it.startswith("?"):
                cols.append(F.col(it[1:]))
                continue
            m = _re.fullmatch(r"\((.*) AS \?(\w+)\)", it,
                              _re.I | _re.S)
            if not m:
                raise ValueError(f"unparseable SELECT item: {it!r}")
            cols.append(_bind_expr(m.group(1).strip())
                        .alias(m.group(2)))
        out = out.select(*cols)
        proj, group = "*", None  # modifiers below run unchanged
    if group or ("(" in proj and proj != "*"):
        # explicit GROUP BY, or aggregates with the implicit single
        # group (SPARQL: `SELECT (COUNT(?x) AS ?n) WHERE ...`)
        keys = [v[1:] for v in group.split()] if group else []
        aggs, ordered = [], []
        for m in _AGG_RE.finditer(proj):
            fn, dis, var, sep, alias, bare = m.groups()
            if bare:
                if bare not in keys:
                    raise ValueError("non-grouped bare variable in SELECT")
                ordered.append(bare)
                continue
            aggs.append(_agg_expr(fn, dis, var, sep).alias(alias))
            ordered.append(alias)
        if not aggs:
            raise ValueError("GROUP BY without aggregates in SELECT")
        extra, preds = _having_conds(having, set(ordered)) \
            if having else ([], [])
        out = out.groupBy(*keys).agg(*aggs, *extra)
        for p in preds:
            out = out.where(p)
        out = out.select(*ordered)
    elif having:
        raise ValueError("HAVING requires aggregates")
    elif proj != "*":
        out = out.select(*[v[1:] for v in proj.split()])
    else:
        # `*` never exposes path-expansion intermediates
        out = out.drop(*[c for c in out.columns if c.startswith("_pp")])
    if distinct:
        out = out.distinct()
    if order:
        # SPARQL spellings: `?a ?b`, `DESC(?a) ?b`, plus the
        # comma/suffix dialect (`?a DESC, ?b`) this front-end has
        # always taken
        keys = []
        for km in _re.finditer(
                r"(DESC|ASC) ?\( ?\?(\w+) ?\)|\?(\w+)( DESC| ASC)?",
                order, _re.I):
            fn, fv, var, suffix = km.groups()
            c = F.col(fv or var)
            desc = (fn or (suffix or "")).strip().upper() == "DESC"
            keys.append(c.desc() if desc else c.asc())
        out = out.orderBy(*keys)
    if offset:
        # SPARQL applies OFFSET before LIMIT (solution-sequence
        # modifiers); Spark's Offset node composes the same way
        out = out.offset(int(offset))
    if limit:
        out = out.limit(int(limit))
    return out


def sparql_construct(triples: DataFrame, query: str) -> DataFrame:
    """SPARQL CONSTRUCT over the same WHERE subset: every template
    pattern instantiates once per binding row, constants stay literal,
    and the union of instantiated templates is returned as a
    (subject, predicate, object) triples frame (distinct, per SPARQL's
    set semantics). The derived-graph verb — rewrite rules, inference
    snippets, projection graphs — running on Catalyst."""
    q = _re.sub(r"\s+", " ", query).strip()
    m = _re.match(r"CONSTRUCT \{(.*?)\}(?: FROM \S+)? (?:WHERE )?"
                  r"\{(.*)\} ?$", q, _re.I)
    if not m:
        raise ValueError("unparseable SPARQL CONSTRUCT")
    template, where = m.groups()
    bindings = sparql_select(triples, f"SELECT * WHERE {{{where}}}")
    return _instantiate(bindings, template)


def _instantiate(bindings: DataFrame, template: str) -> DataFrame:
    """Instantiate a triple-template block once per binding row:
    constants stay literal, vars substitute, rows with an unbound
    template var produce no triple (OPTIONAL miss, per SPARQL).
    Returns a distinct (subject, predicate, object) frame — shared by
    CONSTRUCT and the update verbs' DELETE/INSERT templates."""
    outs = []
    for terms in _split_statements(template):
        cols = []
        for name, term in zip(("subject", "predicate", "object"), terms):
            if name == "predicate" and term == "a":
                term = "rdf:type"
            if term.startswith("?"):
                cols.append(F.col(term[1:]).alias(name))
            else:
                lit = term[1:-1] if term.startswith('"') else term
                cols.append(F.lit(lit).alias(name))
        outs.append(bindings.select(*cols))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.where(F.col("subject").isNotNull()
                     & F.col("predicate").isNotNull()
                     & F.col("object").isNotNull()).distinct()


def sparql_ask(triples: DataFrame, query: str) -> DataFrame:
    """SPARQL ASK: does any binding exist for the WHERE pattern?
    Returns a 1-row (result: boolean) frame; the plan is a LIMIT 1
    existence probe, so the scan stops at the first match."""
    q = _re.sub(r"\s+", " ", query).strip()
    m = _re.match(r"ASK \{(.*)\} ?$", q, _re.I)
    if not m:
        raise ValueError("unparseable SPARQL ASK")
    bindings = sparql_select(triples,
                             f"SELECT * WHERE {{{m.group(1)}}} LIMIT 1")
    exists = bindings.count() > 0
    return triples.sparkSession.createDataFrame(
        [(exists,)], "result boolean")


def sparql_describe(triples: DataFrame, query: str) -> DataFrame:
    """SPARQL DESCRIBE: every triple whose subject is a described
    resource (the simple subject-outbound description — DESCRIBE's
    result form is implementation-defined by spec; endpoints commonly
    return a concise bounded description, of which this is the
    blank-node-free core; our IRI minting never emits blank nodes, so
    the two coincide here).

    Forms: `DESCRIBE <iri>` and `DESCRIBE ?v [WHERE] { patterns }`.
    Compiles to a left-semi join of the triples scan against the
    described-subject set — broadcastable whenever the set is small,
    which Catalyst/AQE decides from runtime stats."""
    q = _re.sub(r"\s+", " ", query).strip()
    m = _re.match(r"DESCRIBE (\S+)(?: (?:WHERE )?\{(.*)\})? ?$",
                  q, _re.I)
    if not m:
        raise ValueError("unparseable SPARQL DESCRIBE")
    term, where = m.groups()
    if term.startswith("?"):
        if not where:
            raise ValueError("DESCRIBE ?var requires a WHERE pattern")
        subjects = sparql_select(
            triples, f"SELECT ?{term[1:]} WHERE {{{where}}}"
        ).select(F.col(term[1:]).alias("subject")).distinct()
        return triples.join(subjects, on="subject", how="left_semi")
    return triples.where(F.col("subject") == term)


_SPO = ["subject", "predicate", "object"]


def _ground_triples(spark, block: str) -> DataFrame:
    """A `{ ground triples }` block -> (subject, predicate, object)."""
    rows = []
    for s, p, o in _split_statements(block):
        if p == "a":
            p = "rdf:type"
        if any(t.startswith("?") for t in (s, p, o)):
            raise ValueError("DATA blocks take ground triples only")
        unq = [t[1:-1] if t.startswith('"') else t for t in (s, p, o)]
        rows.append(tuple(unq))
    return spark.createDataFrame(
        rows, "subject string, predicate string, object string")


def sparql_update(triples: DataFrame, update: str) -> DataFrame:
    """SPARQL UPDATE, functionally: returns the POST-update triples
    frame (the caller stage-writes it — `runlog.run_stage` /
    `materialize.write_spo` are the S9 overwrite-commit seam, exactly
    how the reference's clear.js + update.js pair drives its endpoint;
    endpoint.js:166 `update()` is the generic verb surface).

    Verbs (one operation per call; chain calls for sequences):
      CLEAR [SILENT] [ALL | GRAPH <g>]    -> empty graph (this store
                                             is single-graph; the
                                             graph arg is accepted and
                                             ignored, like `clear
                                             silent all`, clear.js:11)
      INSERT DATA { ground triples }      -> set union
      DELETE DATA { ground triples }      -> set difference
      DELETE WHERE { patterns }           -> patterns are both the
                                             match and the delete
                                             template (pattern-only
                                             WHERE, per spec)
      [DELETE {tpl}] [INSERT {tpl}] WHERE { patterns }
        -> WHERE evaluates against the PRE-update graph (spec
           semantics); deletes apply, then inserts.

    RDF set semantics: an insert that duplicates an existing
    (subject, predicate, object) is dropped via anti-join, so the
    surviving row keeps its metadata columns; inserted rows carry
    NULL for any extra columns (object_is_iri etc.) — run them
    through the sanitizer/typing pass if they need them. Deletes
    anti-join on (subject, predicate, object); Catalyst broadcasts
    the delete set when it is small."""
    q = _re.sub(r"\s+", " ", update).strip()

    m = _re.fullmatch(
        r"CLEAR( SILENT)?( ALL| DEFAULT| NAMED| GRAPH (\S+))? ?",
        q, _re.I)
    if m:
        # with a quads frame the graph argument is honored (the
        # reference's exact verb: `clear silent graph <mms-graph:X>`,
        # clear.js:11-12); on a plain triples frame it clears all,
        # as before (single-graph store)
        if "graph" in triples.columns and m.group(2):
            arg = m.group(2).strip().upper()
            if arg.startswith("GRAPH"):
                g = m.group(3)
                if g.startswith("<") and g.endswith(">"):
                    g = g[1:-1]
                return triples.where(~F.col("graph").eqNullSafe(g))
            if arg == "DEFAULT":
                return triples.where(F.col("graph").isNotNull())
            if arg == "NAMED":
                return triples.where(F.col("graph").isNull())
        return triples.where(F.lit(False))

    m = _re.match(r"(INSERT|DELETE) DATA \{(.*)\} ?$", q, _re.I)
    if m:
        const = _ground_triples(triples.sparkSession, m.group(2))
        if m.group(1).upper() == "DELETE":
            return triples.join(F.broadcast(const), on=_SPO,
                                how="left_anti")
        new = const.join(triples.select(*_SPO), on=_SPO,
                         how="left_anti")
        return triples.unionByName(new, allowMissingColumns=True)

    m = _re.match(r"DELETE WHERE \{(.*)\} ?$", q, _re.I)
    if m:
        bindings = sparql_select(triples,
                                 f"SELECT * WHERE {{{m.group(1)}}}")
        dele = _instantiate(bindings, m.group(1))
        return triples.join(dele, on=_SPO, how="left_anti")

    m = _re.match(r"(?:DELETE \{(.*?)\} )?(?:INSERT \{(.*?)\} )?"
                  r"(?:WHERE )?\{(.*)\} ?$", q, _re.I)
    if m and (m.group(1) or m.group(2)):
        del_tpl, ins_tpl, where = m.groups()
        bindings = sparql_select(triples, f"SELECT * WHERE {{{where}}}")
        out = triples
        if del_tpl:
            out = out.join(_instantiate(bindings, del_tpl), on=_SPO,
                           how="left_anti")
        if ins_tpl:
            ins = _instantiate(bindings, ins_tpl)
            new = ins.join(out.select(*_SPO), on=_SPO, how="left_anti")
            out = out.unionByName(new, allowMissingColumns=True)
        return out

    raise ValueError("unparseable SPARQL UPDATE")
