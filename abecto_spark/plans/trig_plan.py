"""TriG plan-file loader — maps the reference's plan vocabulary
(`av:Plan` / `av:Step` / `av:Aspect` / `av:AspectPattern`, see
`Plans.java:42-84`, `Step.java:89-135`, `Aspect.java:91-124`, and the
shipped `tutorial-configuration.trig`) onto the plan dict consumed by
``plans.driver.run_plan``.

The reference resolves ``av:processorClass`` IRIs like
``java:de.uni_jena.cs.fusion.abecto.processor.FileSourceProcessor`` by
reflection (`Step.java:100-111`); here the trailing class name selects a
processor from the driver registry and its ``av:hasParameter
[av:key ...; av:value ...]`` pairs are converted to typed Python params
(`Parameters.java` converter analog). Relative source paths resolve
against the plan file's directory (`Abecto.java:148-150`).
"""

from __future__ import annotations

import os

from ..sources.turtle import TurtleUnsupported, parse_trig

AV = "http://w3id.org/abecto/vocabulary#"
P_PLAN = "http://purl.org/net/p-plan#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"


class PlanFileError(ValueError):
    pass


# processorClass trailing name -> (driver registry key, param-name map,
# params that are always lists, params holding aspect IRIs)
_LIST_PARAMS = {
    "path", "variables", "aspects", "language_filter_patterns",
    # SparqlSourceProcessor multi-valued parameters
    "list", "followInverse", "followUnlimited", "followInverseUnlimited",
    "ignoreInverse",
}
_PROCESSORS = {
    "FileSourceProcessor": ("file_source", {"path": "path"}),
    "UrlSourceProcessor": ("url_source", {"url": "url"}),
    "SparqlSourceProcessor": (
        "sparql_source",
        {"service": "service", "query": "query", "list": "list",
         "maxDistance": "maxDistance", "followInverse": "followInverse",
         "followUnlimited": "followUnlimited",
         "followInverseUnlimited": "followInverseUnlimited",
         "ignoreInverse": "ignoreInverse",
         "chunkSize": "chunkSize", "maxRetries": "maxRetries"},
    ),
    "JaroWinklerMappingProcessor": (
        "jw_mapping",
        {"aspect": "aspect", "variables": "variables",
         "threshold": "threshold", "caseSensitive": "case_sensitive"},
    ),
    "EquivalentValueMappingProcessor": (
        "equivalent_value_mapping",
        {"aspect": "aspect", "variables": "variables"},
    ),
    "FunctionalMappingProcessor": (
        "functional_mapping",
        {"referringAspect": "referring_aspect",
         "referringVariable": "referring_variable",
         "referredAspect": "referred_aspect"},
    ),
    "UsePresentMappingProcessor": (
        "use_present_mapping",
        {"aspect": "aspect", "variable": "variable"},
    ),
    "PropertyComparisonProcessor": (
        "property_comparison",
        {"aspect": "aspect", "variables": "variables",
         "languageFilterPatterns": "language_filter_patterns",
         "allowTimeSkip": "allow_time_skip",
         "allowLangTagSkip": "allow_lang_tag_skip"},
    ),
    "PopulationComparisonProcessor": (
        "population_comparison", {"aspects": "aspects"},
    ),
    "SparqlConstructProcessor": (
        "construct", {"query": "query", "maxIterations": "max_iterations"},
    ),
    "ForwardRuleReasoningProcessor": ("forward_rules", {"rules": "rules"}),
}


def _coerce(term: tuple):
    """RDF term (o_kind, o_value, o_datatype, o_lang) -> Python value.
    IRIs stay strings (aspect/dataset references are IRIs in both the
    plan file and the plan dict)."""
    kind, value, datatype, _lang = term
    if kind != "literal":
        return value
    if datatype == XSD + "boolean":
        return value == "true"
    if datatype in (XSD + "integer", XSD + "int", XSD + "long", XSD + "short"):
        return int(value)
    if datatype in (XSD + "decimal", XSD + "double", XSD + "float"):
        return float(value)
    return value


class _Graph:
    """Tiny subject->predicate index over the default-graph triples."""

    def __init__(self, quads: list[tuple]):
        self.spo: dict[str, dict[str, list[tuple]]] = {}
        self.order: list[str] = []  # subjects in file order
        for g, s, p, k, v, dt, lang in quads:
            if g != "":
                continue
            if s not in self.spo:
                self.spo[s] = {}
                self.order.append(s)
            self.spo[s].setdefault(p, []).append((k, v, dt, lang))

    def subjects_of_type(self, type_iri: str) -> list[str]:
        return [
            s for s in self.order
            if any(t[1] == type_iri for t in self.spo[s].get(RDF_TYPE, []))
        ]

    def objects(self, s: str, p: str) -> list[tuple]:
        return self.spo.get(s, {}).get(p, [])

    def one(self, s: str, p: str, what: str):
        terms = self.objects(s, p)
        if len(terms) != 1:
            raise PlanFileError(
                f"{what}: expected exactly one {p.rsplit('#', 1)[-1]} on"
                f" <{s}>, found {len(terms)}"
            )
        return terms[0]


def _step_params(g: _Graph, step: str, proc_name: str, base_dir: str) -> dict:
    registry_key, name_map = _PROCESSORS[proc_name]
    params: dict = {}
    for (_k, bnode, _dt, _lang) in g.objects(step, AV + "hasParameter"):
        key_term = g.one(bnode, AV + "key", f"step <{step}> parameter")
        key = key_term[1]
        if key not in name_map:
            raise PlanFileError(
                f"step <{step}>: unknown parameter {key!r} for {proc_name}"
            )
        py_key = name_map[key]
        vals = [_coerce(t) for t in g.objects(bnode, AV + "value")]
        if not vals:
            raise PlanFileError(f"step <{step}>: parameter {key!r} has no value")
        if py_key == "path":
            vals = [
                v if os.path.isabs(v) else os.path.join(base_dir, v)
                for v in vals
            ]
        if py_key in _LIST_PARAMS:
            params[py_key] = vals
        elif len(vals) > 1:
            raise PlanFileError(
                f"step <{step}>: parameter {key!r} must be single-valued"
            )
        else:
            params[py_key] = vals[0]
    return params


def load_trig_plan(path: str, plan_iri: str | None = None) -> dict:
    """Load a reference-vocabulary TriG plan file into a run_plan dict.

    Aspect and dataset names in the returned dict are the (base-resolved)
    IRIs from the file. Named graphs referenced by
    ``av:predefinedMetaDataGraph`` are passed through as inline
    ``predefined_meta_rows`` on the mapping step.
    """
    with open(path, encoding="utf-8") as fh:
        try:
            quads = parse_trig(fh.read())
        except TurtleUnsupported as e:
            raise PlanFileError(f"cannot parse {path}: {e}") from e
    g = _Graph(quads)
    named: dict[str, list[tuple]] = {}
    for gq in quads:
        if gq[0] != "":
            named.setdefault(gq[0], []).append(list(gq[1:]))

    plans = g.subjects_of_type(AV + "Plan")
    if plan_iri is not None:
        if plan_iri not in plans:
            raise PlanFileError(f"plan <{plan_iri}> not found (have {plans})")
        plan = plan_iri
    elif len(plans) == 1:
        plan = plans[0]
    else:
        raise PlanFileError(
            f"expected exactly one av:Plan (or pass plan_iri), found {plans}"
        )

    # aspects + patterns (`Aspect.java:91-124`)
    aspects: dict[str, dict] = {}
    for a in g.subjects_of_type(AV + "Aspect"):
        key_var = g.one(a, AV + "keyVariableName", "aspect")[1]
        aspects[a] = {"key_var": key_var, "patterns": {}}
    for pat in g.subjects_of_type(AV + "AspectPattern"):
        aspect = g.one(pat, AV + "ofAspect", "aspect pattern")[1]
        dataset = g.one(pat, AV + "associatedDataset", "aspect pattern")[1]
        query = g.one(pat, AV + "definingQuery", "aspect pattern")[1]
        if aspect not in aspects:
            raise PlanFileError(f"aspect pattern on undeclared aspect <{aspect}>")
        aspects[aspect]["patterns"][dataset] = query

    # steps (`Step.java:89-135`; predecessor closure `Plans.java:60-84`
    # is handled by the driver's topo-sort over direct inputs)
    steps = []
    for s in g.subjects_of_type(AV + "Step"):
        of_plan = [t[1] for t in g.objects(s, P_PLAN + "isStepOfPlan")]
        if of_plan and plan not in of_plan:
            continue
        proc_iri = g.one(s, AV + "processorClass", "step")[1]
        proc_name = proc_iri.rsplit(".", 1)[-1]
        if proc_name not in _PROCESSORS:
            raise PlanFileError(
                f"step <{s}>: unsupported processor class <{proc_iri}>"
            )
        registry_key, _ = _PROCESSORS[proc_name]
        step: dict = {
            "id": s,
            "processor": registry_key,
            "params": _step_params(g, s, proc_name, os.path.dirname(path)),
        }
        inputs = [t[1] for t in g.objects(s, P_PLAN + "isPrecededBy")]
        if inputs:
            step["inputs"] = sorted(inputs)
        ds = g.objects(s, AV + "associatedDataset")
        if ds:
            step["dataset"] = ds[0][1]
        meta_rows: list[tuple] = []
        for (_k, graph_iri, _dt, _lang) in g.objects(
            s, AV + "predefinedMetaDataGraph"
        ):
            if graph_iri not in named:
                raise PlanFileError(
                    f"step <{s}>: predefinedMetaDataGraph <{graph_iri}>"
                    " is not a named graph in this file"
                )
            meta_rows.extend(named[graph_iri])
        if meta_rows:
            step["params"]["predefined_meta_rows"] = meta_rows
        steps.append(step)

    return {"aspects": aspects, "steps": steps}
