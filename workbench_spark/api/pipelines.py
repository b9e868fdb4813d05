"""Pipeline DAG manager + hierarchy — the ``Meta.pipelines()`` surface.

Reference parity (re-expressed, not ported):
- ``lambda_layer/pipeline_manager.py`` — pipelines.json semantics: one
  bipartite dependency DAG (typed artifact nodes ``ds:/fs:/model:/
  public:/endpoint:`` + job nodes, semantic edges artifact→job consumes,
  job→artifact produces), dependency groups (weakly-connected
  components, id = smallest root artifact), topological freshness plan
  (missing / stale / upstream forward-flood / no_inputs / up_to_date).
- ``utils/pipeline_serializer.py`` — node-link wire format, the
  arbitrary-depth group tree keyed by each pipeline's relative_dir, the
  role-aware ``linearize`` collapse (jobs → artifact-lineage edges), and
  the promotion map.
- ``utils/pipeline_utils.py`` — ``base_model_name`` (promotion date
  suffix), ``find_pipelines``, ``endpoint_group_paths``.

Deliberately DRIVER-SIDE, by design and not by accident: a pipelines
hierarchy is configuration — tens of jobs per file, thousands at the
very largest — so a plain-dict DAG is the right tool and a Spark job
would be overhead. No networkx (not in the container): union-find and
Kahn's topological sort are hand-rolled. The AWS mtime resolvers are out
of engine scope; freshness takes an injected ``mtime_fn(ref) ->
datetime | None`` (the same injection seam the reference exposes for
simulation), with a local-filesystem default for parquet-backed
artifacts.
"""

from __future__ import annotations

import json
import logging
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, NamedTuple, Optional

log = logging.getLogger("workbench_spark")

# Promotion copies the winning model to "<base-name>-YYMMDD"; the pipeline
# declares the base name, so the date must come off before lookups.
PROMOTION_SUFFIX = re.compile(r"-\d{6}$")

SCRIPT_SCHEMES = ("workbench:", "plugin:", "s3://")


def ref_type(ref: str) -> str:
    """Type prefix of an artifact ref, e.g. 'fs:caco2_1' -> 'fs'."""
    return ref.partition(":")[0]


def ref_name(ref: str) -> str:
    """Name portion of an artifact ref, e.g. 'fs:caco2_1' -> 'caco2_1'."""
    return ref.partition(":")[2]


def base_model_name(name: str) -> str:
    """Strip a promotion date suffix ('my-model-260715' -> 'my-model')."""
    return PROMOTION_SUFFIX.sub("", name)


def is_schemed_script(ref: str) -> bool:
    return str(ref).startswith(SCRIPT_SCHEMES)


@dataclass
class Job:
    """One script run: N declared artifact inputs, N declared outputs.

    The submission unit — running it regenerates all its outputs.
    """

    script: Any
    mode: Optional[str] = None
    outputs: list = field(default_factory=list)
    inputs: list = field(default_factory=list)
    pipeline: Optional[str] = None
    relative_dir: Optional[str] = None
    group: Optional[str] = None

    @property
    def key(self) -> tuple:
        return (str(self.script), self.mode)

    @property
    def stem(self) -> str:
        if callable(self.script) and not isinstance(self.script, (str, Path)):
            # callable jobs (the execute_plan engine path): repr contains
            # dots + an address, which Path.stem mangles into COLLIDING ids
            # for same-named closures — use the name + identity instead
            name = getattr(self.script, "__name__", "callable")
            return f"{name}_{id(self.script):x}"
        s = str(self.script)
        return Path(s.split("/")[-1]).stem

    @property
    def node_id(self) -> str:
        return f"{self.stem} [{self.mode}]" if self.mode else self.stem


def parse_spec(spec: dict, relative_dir: str | None = None) -> list[Job]:
    """Parse one pipelines.json dict ({"pipelines": {name: [raw, ...]}})."""
    jobs: list[Job] = []
    for pipeline_name, raw_jobs in (spec.get("pipelines") or {}).items():
        for raw in raw_jobs:
            jobs.append(
                Job(
                    script=raw["script"],
                    mode=raw.get("mode"),
                    outputs=list(raw.get("outputs", [])),
                    inputs=list(raw.get("inputs", [])),
                    pipeline=pipeline_name,
                    relative_dir=relative_dir,
                )
            )
    return jobs


class PlanItem(NamedTuple):
    job: Job
    run: bool
    reason: str


class PipelineManager:
    """Loads every pipelines.json under a root into one dependency DAG.

    Graph representation: ``self.succ``/``self.pred`` adjacency dicts over
    node ids — artifact refs (strings) and job keys (tuples). Bipartite by
    construction: only artifact→job and job→artifact edges exist, so a
    ds→fs→model chain is structural (it can only pass through jobs).
    """

    def __init__(self, path: str | Path):
        self._init_from_jobs(self._discover_local(str(path)))

    @classmethod
    def from_jobs(cls, jobs: list[Job]) -> "PipelineManager":
        pm = cls.__new__(cls)
        pm._init_from_jobs(list(jobs))
        return pm

    # -- discovery -----------------------------------------------------------

    @staticmethod
    def _discover_local(path: str) -> list[Job]:
        root = Path(path)
        jobs: list[Job] = []
        for cfg in sorted(root.rglob("pipelines.json")):
            rel = cfg.parent.relative_to(root).as_posix()
            rel = "" if rel == "." else rel
            with open(cfg) as fh:
                jobs += parse_spec(json.load(fh), relative_dir=rel)
        return jobs

    # -- construction --------------------------------------------------------

    def _init_from_jobs(self, jobs: list[Job]) -> None:
        self.jobs = jobs
        self._producer: dict[str, Job] = {}
        for job in jobs:
            for out in job.outputs:
                if out in self._producer:
                    raise ValueError(
                        f"artifact {out!r} has two producers: "
                        f"{self._producer[out].node_id!r} and {job.node_id!r}"
                    )
                self._producer[out] = job
        self._by_key = {}
        for job in jobs:
            if job.key in self._by_key:
                raise ValueError(f"duplicate job (script, mode): {job.key!r}")
            self._by_key[job.key] = job
        self._build_graph()
        self._assign_dependency_groups()

    def _build_graph(self) -> None:
        self.succ: dict = {}
        self.pred: dict = {}
        self.node_kind: dict = {}

        def add_node(n, kind):
            self.succ.setdefault(n, [])
            self.pred.setdefault(n, [])
            self.node_kind[n] = kind

        for job in self.jobs:
            add_node(job.key, "job")
            for ref in (*job.inputs, *job.outputs):
                if ref not in self.node_kind:
                    add_node(ref, "artifact")
            for inp in job.inputs:
                self.succ[inp].append(job.key)
                self.pred[job.key].append(inp)
            for out in job.outputs:
                self.succ[job.key].append(out)
                self.pred[out].append(job.key)

        # Kahn's algorithm: anything left un-emitted sits on a cycle.
        indeg = {n: len(ps) for n, ps in self.pred.items()}
        queue = [n for n, d in indeg.items() if d == 0]
        seen = 0
        while queue:
            n = queue.pop()
            seen += 1
            for m in self.succ[n]:
                indeg[m] -= 1
                if indeg[m] == 0:
                    queue.append(m)
        if seen != len(self.node_kind):
            cyclic = sorted(
                self._label(n) for n, d in indeg.items() if d > 0
            )
            raise ValueError(f"pipeline dependency cycle among: {', '.join(cyclic)}")

    def _label(self, n) -> str:
        return self._by_key[n].node_id if self.node_kind.get(n) == "job" else str(n)

    def _assign_dependency_groups(self) -> None:
        """Union-find weakly-connected components; group id = the smallest
        root artifact (no producer) of the component, falling back to the
        smallest job node_id for a component of input-less jobs."""
        parent: dict = {n: n for n in self.node_kind}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra

        for n, outs in self.succ.items():
            for m in outs:
                union(n, m)

        comps: dict = {}
        for n in self.node_kind:
            comps.setdefault(find(n), []).append(n)
        for members in comps.values():
            roots = sorted(
                n
                for n in members
                if self.node_kind[n] == "artifact" and not self.pred[n]
            )
            jobs = [self._by_key[n] for n in members if self.node_kind[n] == "job"]
            group_id = roots[0] if roots else min(j.node_id for j in jobs)
            for job in jobs:
                job.group = group_id

    # -- pipelines (named, human units) --------------------------------------

    def list_pipelines(self) -> list[str]:
        names: dict[str, None] = {}
        for job in self.jobs:
            if job.pipeline:
                names.setdefault(job.pipeline)
        return list(names)

    def get_num_pipelines(self) -> int:
        return len(self.list_pipelines())

    def _pipeline_nodes(self, name: str) -> list:
        jobs = [j for j in self.jobs if j.pipeline == name]
        if not jobs:
            raise KeyError(f"no pipeline named {name!r}")
        nodes = []
        for j in jobs:
            nodes.append(j.key)
            nodes += [r for r in (*j.inputs, *j.outputs)]
        seen: dict = {}
        for n in nodes:
            seen.setdefault(n)
        return list(seen)

    def get_pipeline(self, name: str) -> dict:
        """One pipeline's sub-DAG as a node-link dict."""
        return self._serialize(self._pipeline_nodes(name))

    def get_pipeline_relative_dir(self, name: str) -> str:
        for job in self.jobs:
            if job.pipeline == name:
                return job.relative_dir or ""
        raise KeyError(f"no pipeline named {name!r}")

    # -- dependency groups ---------------------------------------------------

    def dependency_groups(self) -> dict[str, list[Job]]:
        groups: dict[str, list[Job]] = {}
        for job in self.jobs:
            groups.setdefault(job.group, []).append(job)
        return groups

    def list_dependency_groups(self) -> list[str]:
        return sorted(self.dependency_groups())

    # -- graph slices ---------------------------------------------------------

    def full_dependency_graph(self) -> dict:
        return self._serialize(list(self.node_kind))

    def _reachable(self, start: str, adjacency: dict) -> list:
        out, frontier = {start: None}, [start]
        while frontier:
            n = frontier.pop()
            for m in adjacency.get(n, []):
                if m not in out:
                    out[m] = None
                    frontier.append(m)
        return list(out)

    def upstream_graph(self, artifact: str) -> dict:
        return self._serialize(self._reachable(artifact, self.pred))

    def downstream_graph(self, artifact: str) -> dict:
        return self._serialize(self._reachable(artifact, self.succ))

    # -- wire format ----------------------------------------------------------

    def _job_wire_id(self, job: Job) -> str:
        """Globally-unique job node id: keyed by its (one-producer) outputs,
        falling back to script+mode for output-less jobs. The 'job:' prefix
        cannot collide with an artifact ref."""
        if job.outputs:
            return "job:" + ";".join(sorted(job.outputs))
        return f"job:{job.stem}:{job.mode}"

    def _serialize(self, node_ids: list) -> dict:
        """Node-link dict over a node subset, with induced edges."""
        ids = {
            n: (self._job_wire_id(self._by_key[n]) if self.node_kind[n] == "job" else n)
            for n in node_ids
        }
        nodes = [
            {"id": ids[n], "kind": "job"}
            if self.node_kind[n] == "job"
            else {"id": n, "kind": "artifact", "type": ref_type(n)}
            for n in node_ids
        ]
        keep = set(node_ids)
        links = [
            {"source": ids[u], "target": ids[v]}
            for u in node_ids
            for v in self.succ[u]
            if v in keep
        ]
        return {"nodes": nodes, "links": links}

    # -- freshness plan --------------------------------------------------------

    def _topo_jobs(self) -> list[Job]:
        indeg = {n: len(ps) for n, ps in self.pred.items()}
        queue = sorted((n for n, d in indeg.items() if d == 0), key=self._label)
        order = []
        while queue:
            n = queue.pop(0)
            order.append(n)
            ready = []
            for m in self.succ[n]:
                indeg[m] -= 1
                if indeg[m] == 0:
                    ready.append(m)
            queue += sorted(ready, key=self._label)
        return [self._by_key[n] for n in order if self.node_kind[n] == "job"]

    def _needs_run(self, job: Job, mtime_fn, running: set) -> tuple[bool, str]:
        if not job.outputs:
            return True, "unmanaged"
        out_times = [mtime_fn(ref) for ref in job.outputs]
        if any(t is None for t in out_times):
            return True, "missing"
        out_time = min(out_times)
        # forward flood: an immediate upstream job re-running makes this
        # one stale regardless of current timestamps
        for ref in job.inputs:
            producer = self._producer.get(ref)
            if producer is not None and producer is not job and producer.key in running:
                return True, "upstream"
        if not job.inputs:
            log.warning(
                f"job {job.node_id!r} declares no inputs; running unconditionally"
            )
            return True, "no_inputs"
        in_times = [t for ref in job.inputs if (t := mtime_fn(ref)) is not None]
        if in_times and max(in_times) > out_time:
            return True, "stale"
        return False, "up_to_date"

    def plan(self, mtime_fn=None, force: list | None = None) -> list[PlanItem]:
        """One topological pass, Dagster-style forward staleness flood."""
        mtime_fn = mtime_fn or (lambda ref: None)
        forced = set(force or [])
        running: set = set()
        items = []
        for job in self._topo_jobs():
            if job.pipeline in forced or job.node_id in forced:
                run, reason = True, "selected"
            else:
                run, reason = self._needs_run(job, mtime_fn, running)
            if run:
                running.add(job.key)
            items.append(PlanItem(job, run, reason))
        return items


# ---------------------------------------------------------------- linearize

# Canonical artifact-lineage order: a model derives from a feature set, an
# endpoint from a model — platform facts, so threading by band is not a guess.
_TYPE_BAND = {"ds": 0, "public": 0, "fs": 1, "model": 2, "endpoint": 3}


def _band(artifact_type) -> int:
    return _TYPE_BAND.get(artifact_type, 2)


def linearize(node_link: dict) -> dict:
    """Collapse a bipartite node-link dict to the artifact-only lineage DAG.

    Per job: its outputs chain up the type ladder among themselves
    (ds→fs→model→endpoint), then its inputs feed every artifact in its
    LOWEST output band. Adjacent output bands with several artifacts each
    pair by ref-name (an endpoint is named for its source model — real
    identity); if the names don't line up 1:1 the whole job falls back to
    the plain input→output fan (a visible "split this job" signal).
    """
    art_type = {n["id"]: n["type"] for n in node_link["nodes"] if n["kind"] == "artifact"}
    jobs = {n["id"] for n in node_link["nodes"] if n["kind"] == "job"}

    inbound: dict = {}
    outbound: dict = {}
    for link in node_link["links"]:
        if link["target"] in jobs:
            inbound.setdefault(link["target"], []).append(link["source"])
        if link["source"] in jobs:
            outbound.setdefault(link["source"], []).append(link["target"])

    links = []
    for job in jobs:
        inputs = inbound.get(job, [])
        outputs = outbound.get(job, [])
        by_band: dict[int, list] = {}
        for out in outputs:
            by_band.setdefault(_band(art_type.get(out)), []).append(out)
        bands = sorted(by_band)

        chain, ambiguous = [], False
        for lo, hi in zip(bands, bands[1:]):
            a, b = sorted(by_band[lo]), sorted(by_band[hi])
            if len(a) > 1 and len(b) > 1:
                a_names = {ref_name(x): x for x in a}
                b_names = {ref_name(x): x for x in b}
                if set(a_names) == set(b_names) and len(a_names) == len(a) == len(b):
                    chain += [(a_names[k], b_names[k]) for k in a_names]
                else:
                    ambiguous = True
                    break
            else:
                chain += [(x, y) for x in a for y in b]
        if ambiguous or not outputs:
            links += [{"source": i, "target": o} for i in inputs for o in outputs]
            continue
        links += [{"source": s, "target": t} for s, t in chain]
        lowest = sorted(by_band[bands[0]])
        links += [{"source": i, "target": o} for i in inputs for o in lowest]

    seen: dict = {}
    deduped = []
    for l in links:
        k = (l["source"], l["target"])
        if k not in seen:
            seen[k] = None
            deduped.append(l)
    return {
        "nodes": [
            {"id": aid, "type": typ} for aid, typ in sorted(art_type.items())
        ],
        "links": deduped,
    }


# ------------------------------------------------------------- hierarchy


def _new_group(name: str) -> dict:
    return {"name": name, "subgroups": {}, "pipelines": {}}


def _finalize(group: dict) -> dict:
    return {
        "name": group["name"],
        "subgroups": [_finalize(g) for _, g in sorted(group["subgroups"].items())],
        "pipelines": group["pipelines"],
    }


def pipeline_hierarchy(root: str) -> list:
    """The full hierarchy as a group tree of linearized node-link dicts.

    A group is {"name", "subgroups": [group...], "pipelines":
    {name: node_link}}; the leaf dir holding a pipelines.json carries the
    pipelines, its ancestors are nesting.
    """
    if not root:
        return []
    pm = _load(root)
    if pm is None:
        return []
    root_group = _new_group("")
    for name in pm.list_pipelines():
        node = root_group
        segs = [s for s in pm.get_pipeline_relative_dir(name).split("/") if s]
        if not segs:
            # reference parity (_group_segments): a root-level
            # pipelines.json nests its pipelines under a group named after
            # the root directory — otherwise they'd land on the synthetic
            # root group and be discarded by the ['subgroups'] return.
            segs = [Path(root).resolve().name]
        for seg in segs:
            node = node["subgroups"].setdefault(seg, _new_group(seg))
        if name in node["pipelines"]:
            log.warning(f"Duplicate pipeline name {name!r}; keeping first")
            continue
        node["pipelines"][name] = linearize(pm.get_pipeline(name))
    return _finalize(root_group)["subgroups"]


def single_pipeline(root: str, name: str) -> Optional[dict]:
    pm = _load(root) if root else None
    if pm is None:
        return None
    try:
        return linearize(pm.get_pipeline(name))
    except KeyError:
        log.warning(f"No pipeline named {name!r} under {root}")
        return None


def promotion_map(root: str) -> dict:
    """{champion endpoint: [challenger model names]} — from jobs whose
    script stem starts with 'model_promotion'."""
    pm = _load(root) if root else None
    if pm is None:
        return {}
    promo: dict = {}
    for job in pm.jobs:
        if not job.stem.startswith("model_promotion"):
            continue
        challengers = sorted(ref_name(i) for i in job.inputs if ref_type(i) == "model")
        for out in job.outputs:
            if ref_type(out) == "endpoint":
                promo[ref_name(out)] = challengers
    return promo


def _load(root: str) -> Optional[PipelineManager]:
    try:
        return PipelineManager(root)
    except Exception as e:
        log.error(f"Failed to load pipelines from {root}: {e}")
        return None


# ------------------------------------------------------------- lookups


def find_pipelines(name: str, artifact_type: str = "model", pipelines: list = None) -> list:
    """Pipelines declaring an artifact, tolerant of promotion suffixes.

    Returns one {"group", "pipeline", "matched"} dict per hit.
    """
    if pipelines is None:
        return []
    candidates = [name]
    base = base_model_name(name)
    if base != name:
        candidates.append(base)
    wanted = [f"{artifact_type}:{c}" for c in candidates]

    hits = []
    for group in pipelines:
        for pipeline_name, graph in (group.get("pipelines") or {}).items():
            node_ids = {n["id"] for n in graph["nodes"]}
            for node_id in wanted:
                if node_id in node_ids:
                    hits.append(
                        {"group": group["name"], "pipeline": pipeline_name, "matched": node_id}
                    )
                    break
        hits += find_pipelines(name, artifact_type, group.get("subgroups") or [])
    return hits


def endpoint_group_paths(pipelines: list) -> dict:
    """{endpoint_name: [group path root→leaf]} over the hierarchy."""
    groups: dict = {}

    def walk(nodes, path):
        for g in nodes:
            p = path + [g["name"]]
            for graph in (g.get("pipelines") or {}).values():
                for node in graph.get("nodes", []):
                    if node.get("type") == "endpoint":
                        groups.setdefault(node["id"].split(":", 1)[-1], p)
            walk(g.get("subgroups") or [], p)

    walk(pipelines or [], [])
    return groups


# ----------------------------------------------------------------- executor
class ExecutionRecord(NamedTuple):
    job: Job
    action: str  # ran | skipped | failed | blocked
    reason: str
    error: Optional[Exception] = None


def default_runner(job: Job) -> None:
    """Engine-scope script execution: a Job whose ``script`` is a Python
    callable is invoked with the job (the Transform-ABC integration point
    — pass e.g. ``lambda job: MyTransform(**params).transform(df)`` bound
    closures, or any artifact-(re)building function). Path/scheme scripts
    are the reference launcher's subprocess/SQS submission surface
    (ml_pipeline_launcher.py:742-824) — CLI/AWS plumbing, out of engine
    scope, so they need an injected runner."""
    if callable(job.script):
        job.script(job)
        return
    raise NotImplementedError(
        f"job {job.node_id!r}: script submission for {job.script!r} is the "
        "launcher's CLI/AWS surface; inject runner= to execute_plan"
    )


def execute_plan(
    manager: "PipelineManager",
    runner: Callable[[Job], None] | None = None,
    mtime_fn=None,
    force: list | None = None,
    dry_run: bool = False,
    stop_on_error: bool = False,
) -> list[ExecutionRecord]:
    """Walk the freshness plan in topological order and (re)build every
    missing/stale artifact — the engine core of the reference's
    ml_pipeline_launcher (sort_pipelines → run loop, py:213-824; the
    countdown/SQS/Batch submission stays out of scope).

    Semantics:
    - ``plan()`` already forward-floods staleness, so exactly the suffix
      downstream of a missing/stale artifact is marked run=True; jobs that
      are up-to-date are recorded as ``skipped``.
    - A failing job records ``failed`` and every not-yet-run job reachable
      through its outputs records ``blocked`` (the reference launcher
      merely logs and keeps submitting — py:816-818 — which can waste a
      cluster-sized rebuild on poisoned inputs; blocking the flooded
      suffix is the deliberate divergence, documented here).
    - ``stop_on_error=True`` raises after recording the failure instead.
    - ``dry_run=True`` records ``would_run`` without executing — the
      launcher's simulation surface (run_simulation, py:884-923).

    Driver-side by design (module docstring): the DAG is configuration;
    each *job body* is what actually runs Spark work.
    """
    runner = runner or default_runner
    items = manager.plan(mtime_fn=mtime_fn, force=force)
    records: list[ExecutionRecord] = []
    poisoned: set = set()  # artifact refs produced by failed/blocked jobs
    for item in items:
        job = item.job
        if not item.run:
            records.append(ExecutionRecord(job, "skipped", item.reason))
            continue
        if any(ref in poisoned for ref in job.inputs):
            poisoned.update(job.outputs)
            records.append(ExecutionRecord(job, "blocked", "upstream_failed"))
            continue
        if dry_run:
            records.append(ExecutionRecord(job, "would_run", item.reason))
            continue
        try:
            runner(job)
        except Exception as exc:  # noqa: BLE001 — recorded, optionally re-raised
            poisoned.update(job.outputs)
            records.append(ExecutionRecord(job, "failed", item.reason, exc))
            if stop_on_error:
                raise
            continue
        records.append(ExecutionRecord(job, "ran", item.reason))
    return records


def local_parquet_mtime(root: str) -> Callable[[str], Optional[float]]:
    """An mtime_fn for filesystem-backed artifacts: ``ref`` (``ds:name`` /
    ``fs:name`` / ...) resolves to <root>/<name>; returns the newest mtime
    under that directory, or None when absent — the local twin of the
    reference's AWS artifact-timestamp resolvers."""
    import os

    def mtime(ref: str) -> Optional[float]:
        path = Path(root) / ref_name(ref)
        if not path.exists():
            return None
        if path.is_file():
            return os.path.getmtime(path)
        newest = os.path.getmtime(path)
        for dirpath, _dirs, files in os.walk(path):
            for fn in files:
                newest = max(newest, os.path.getmtime(os.path.join(dirpath, fn)))
        return newest

    return mtime
