"""OWL functional-syntax source/sink (SURVEY.md §2.1 S1/S6).

S1: parse an OWL functional-syntax ontology file (the EL fragment the
reference consumes — SubClassOf / EquivalentClasses with
ObjectIntersectionOf + ObjectSomeValuesFrom nesting, SubObjectPropertyOf,
TransitiveObjectProperty, SubPropertyChainOf, AnnotationAssertion with
rdfs:label / skos:prefLabel) into the engine's relational ontology
tables.  The reference delegates to the OWL-API (SubontologyExtraction.java:96);
here a recursive-descent reader runs over the file's logical lines.

Parsing happens driver-side for ontology files (they are configuration-
sized next to the corpus); the distributed path for corpus-scale input
is subont.extract.  S6 renders axiom rows back to functional syntax.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from .model import And, Expr, Ontology, OntologyBuilder, Some

_ID_RE = re.compile(r"<?(?:http://snomed\.info/id/)?:?(\d+)>?$")


def _sctid(token: str) -> int:
    m = _ID_RE.match(token.strip())
    if not m:
        raise ValueError(f"not an SCTID token: {token!r}")
    return int(m.group(1))


def _tokenize(s: str) -> list[str]:
    out, buf = [], []
    for ch in s:
        if ch in "()":
            if buf:
                out.append("".join(buf))
                buf = []
            out.append(ch)
        elif ch.isspace():
            if buf:
                out.append("".join(buf))
                buf = []
        else:
            buf.append(ch)
    if buf:
        out.append("".join(buf))
    return out


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str:
        return self.toks[self.i]

    def next(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, t: str) -> None:
        got = self.next()
        if got != t:
            raise ValueError(f"expected {t!r}, got {got!r}")

    def class_expr(self) -> Expr:
        t = self.next()
        if t == "ObjectIntersectionOf":
            self.expect("(")
            members = []
            while self.peek() != ")":
                members.append(self.class_expr())
            self.expect(")")
            return And(members)
        if t == "ObjectSomeValuesFrom":
            self.expect("(")
            role = _sctid(self.next())
            filler = self.class_expr()
            self.expect(")")
            return Some(role, filler)
        return _sctid(t)


def _logical_lines(text: str) -> list[str]:
    """Join physical lines into balanced-paren logical statements,
    dropping comments and prefix/ontology headers."""
    out = []
    buf = ""
    depth = 0
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip() if raw.lstrip().startswith("#") else raw.strip()
        if not line:
            continue
        # drop the Ontology(...) wrapper, prefix decls, version IRIs and
        # the wrapper's closing paren (only when not inside a statement)
        if re.match(r"^(Prefix\(|Ontology\(|<http)", line):
            continue
        if line == ")" and depth == 0 and not buf:
            continue
        buf = (buf + " " + line).strip() if buf else line
        depth += line.count("(") - line.count(")")
        if depth <= 0 and buf:
            out.append(buf)
            buf = ""
            depth = 0
    return out


def parse_functional(text: str) -> OntologyBuilder:
    b = OntologyBuilder()
    for stmt in _logical_lines(text):
        head = stmt.split("(", 1)[0].strip()
        body = stmt[len(head):].strip()
        if head == "SubClassOf":
            p = _Parser(_tokenize(body))
            p.expect("(")
            lhs = p.class_expr()
            rhs = p.class_expr()
            if isinstance(lhs, int):
                b.add_subclass(lhs, rhs)
            else:  # GCI: anonymous LHS ⊑ named RHS
                if not isinstance(rhs, int):
                    raise ValueError("GCI with complex RHS unsupported (matches reference)")
                b.add_gci(lhs, rhs)
        elif head == "EquivalentClasses":
            p = _Parser(_tokenize(body))
            p.expect("(")
            lhs = p.class_expr()
            rhs = p.class_expr()
            if isinstance(lhs, int):
                b.add_equiv(lhs, rhs)
            elif isinstance(rhs, int):
                b.add_equiv(rhs, lhs)
            else:
                raise ValueError("EquivalentClasses between two complex expressions unsupported")
        elif head == "SubObjectPropertyOf":
            p = _Parser(_tokenize(body))
            p.expect("(")
            if p.peek() == "ObjectPropertyChain":
                p.expect("ObjectPropertyChain")
                p.expect("(")
                chain = []
                while p.peek() != ")":
                    chain.append(_sctid(p.next()))
                p.expect(")")
                sup = _sctid(p.next())
                if len(chain) != 2:
                    raise ValueError("only binary property chains supported (EL/SNOMED)")
                b.role_chains.append(dict(super_role=sup, left_role=chain[0], right_role=chain[1]))
                b.object_properties.update(chain + [sup])
            else:
                child = _sctid(p.next())
                parent = _sctid(p.next())
                b.add_subproperty(child, parent)
        elif head == "SubDataPropertyOf":
            p = _Parser(_tokenize(body))
            p.expect("(")
            b.add_subproperty(_sctid(p.next()), _sctid(p.next()), data=True)
        elif head == "TransitiveObjectProperty":
            p = _Parser(_tokenize(body))
            p.expect("(")
            b.transitive_roles.add(_sctid(p.next()))
        elif head == "ReflexiveObjectProperty":
            p = _Parser(_tokenize(body))
            p.expect("(")
            b.reflexive_roles.add(_sctid(p.next()))
        elif head == "AnnotationAssertion":
            m = re.match(
                r'AnnotationAssertion\(\s*(\S+)\s+(\S+)\s+"((?:[^"\\]|\\.)*)"', stmt
            )
            if m:
                prop, ent, value = m.group(1), m.group(2), m.group(3)
                try:
                    b.add_annotation(_sctid(ent), prop, value)
                except ValueError:
                    pass
        elif head in ("Declaration", "Prefix", "Ontology"):
            continue
    return b


def load_functional(spark: SparkSession, path: str) -> Ontology:
    """S1: ontology file → relational tables."""
    with open(path, encoding="utf-8") as f:
        return parse_functional(f.read()).build(spark)


# ---- S6: render back --------------------------------------------------------

def _iri(cid: int) -> str:
    return f"<http://snomed.info/id/{cid}>"


def render_axioms(ont: Ontology) -> list[str]:
    """Axiom rows → functional-syntax strings (driver-side; subontology
    axiom sets are small).  PV refs are expanded from the pvs table."""
    return sorted(expr for _, expr in render_axiom_rows(ont))


def render_axiom_rows(ont: Ontology) -> list[tuple[int, str]]:
    """(referenced_component_id, functional-syntax axiom) pairs — the
    referenced component of a GCI is its named RHS superclass, matching
    the reference's OWL refset (OWLtoRF2Service.java:80-83)."""
    pvs = {r["pv_id"]: r.asDict() for r in ont.pvs.collect()}

    def ref_str(kind: str, rid: int) -> str:
        if kind == "c":
            return _iri(rid)
        pv = pvs[rid]
        if pv["filler_concept"] is not None:
            filler = _iri(pv["filler_concept"])
        else:
            parts = [ref_str(x["kind"], x["ref_id"]) for x in pv["filler_refs"]]
            filler = parts[0] if len(parts) == 1 else f"ObjectIntersectionOf({' '.join(parts)})"
        return f"ObjectSomeValuesFrom({_iri(pv['role_id'])} {filler})"

    out = []
    for r in ont.axioms.collect():
        parts = [ref_str(x["kind"], x["ref_id"]) for x in r["rhs"]]
        rhs = parts[0] if len(parts) == 1 else f"ObjectIntersectionOf({' '.join(parts)})"
        if r["is_gci"]:
            out.append((r["gci_super"], f"SubClassOf({rhs} {_iri(r['gci_super'])})"))
        elif r["is_equiv"]:
            out.append((r["sub_id"], f"EquivalentClasses({_iri(r['sub_id'])} {rhs})"))
        else:
            out.append((r["sub_id"], f"SubClassOf({_iri(r['sub_id'])} {rhs})"))
    for r in ont.subprops.collect():
        out.append((r["child"], f"SubObjectPropertyOf({_iri(r['child'])} {_iri(r['parent'])})"))
    return out
