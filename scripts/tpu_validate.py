import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np, jax
from networks_fenicsx_tpu.utils.platform import enable_compilation_cache
enable_compilation_cache()  # warm re-runs skip the per-check XLA compiles
from networks_fenicsx_tpu import (HydraulicNetworkAssembler, NetworkMesh, Solver,
                                  SolverOptions, network_generation, solve_sweep)
from networks_fenicsx_tpu.post_processing import extract_global_flux
import networkx as nx

assert jax.default_backend() == "tpu", jax.default_backend()
results = []

def check(name, ok, detail=""):
    results.append((name, ok, detail)); print(("PASS " if ok else "FAIL ") + name + " " + detail, flush=True)

# 1. Y-bifurcation analytic on TPU, all methods
G = network_generation.make_tree(2, 1, 3)
mesh = NetworkMesh(G, N=4)
lam_exact = -1/(np.sqrt(2.5)+1)
for method in ["schur", "dense", "minres", "host_lu"]:
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[1])
    s = Solver(asm, options=SolverOptions(method=method, rtol=1e-13))
    s.assemble(); sol = s.solve()
    err = abs(float(sol[-1].values[0]) - lam_exact)
    check(f"Y-analytic[{method}]", err < 1e-8, f"err={err:.1e}")

# 2. schur sub-methods on a deeper tree
G5 = network_generation.make_tree(5, 2, 3)
m5 = NetworkMesh(G5, N=2, color_strategy="fast")
ref = None
for sm in ["tree", "dense", "dense_f64", "cg"]:
    asm = HydraulicNetworkAssembler(m5)
    asm.compute_forms(p_bc_ex=lambda x: x[1], R=np.linspace(1, 3, m5.num_edges))
    s = Solver(asm, options=SolverOptions(method="schur", schur_method=sm, rtol=1e-13))
    s.assemble(); sol = s.solve()
    x = np.concatenate([f.values for f in sol])
    if ref is None: ref = x
    err = float(np.max(np.abs(x - ref)))
    check(f"tree5-schur[{sm}]", err < 1e-8, f"diff-vs-tree={err:.1e}")

# 3. cyclic core on TPU
Gc = nx.DiGraph()
pos = {0:(0,0,0),1:(0,0,1),2:(.2,.2,2),3:(-.2,.3,2),4:(0,.1,2.1),5:(.1,-.1,3),6:(-.3,.4,4),7:(0,0,1.1)}
for kk,v in pos.items(): Gc.add_node(kk, pos=np.array(v,float))
for e in [(0,1),(1,7),(7,2),(2,5),(7,3),(3,4),(4,5),(7,4),(5,6)]: Gc.add_edge(*e)
mc = NetworkMesh(Gc, N=3)
a1 = HydraulicNetworkAssembler(mc); a1.compute_forms(p_bc_ex=lambda x: x[2])
s1 = Solver(a1, options=SolverOptions(method="schur", schur_method="tree")); s1.assemble(); so1 = s1.solve()
a2 = HydraulicNetworkAssembler(mc); a2.compute_forms(p_bc_ex=lambda x: x[2])
s2 = Solver(a2, options=SolverOptions(method="host_lu")); s2.assemble(); so2 = s2.solve()
err = max(float(np.max(np.abs(a.values-b.values))) for a,b in zip(so1,so2))
check("cyclic-core-vs-LU", err < 1e-8, f"err={err:.1e}")

# 4. continuous pressure (schur_p) on TPU
a3 = HydraulicNetworkAssembler(m5, flux_degree=2, pressure_degree=1)
a3.compute_forms(p_bc_ex=lambda x: x[1])
s3 = Solver(a3, options=SolverOptions(method="schur_p", rtol=1e-12)); s3.assemble(); so3 = s3.solve()
a4 = HydraulicNetworkAssembler(m5, flux_degree=2, pressure_degree=1)
a4.compute_forms(p_bc_ex=lambda x: x[1])
s4 = Solver(a4, options=SolverOptions(method="host_lu")); s4.assemble(); so4 = s4.solve()
err = max(float(np.max(np.abs(a.values-b.values))) for a,b in zip(so3,so4))
check("schur_p-vs-LU", err < 1e-7, f"err={err:.1e} iters={s3.info.iterations}")

# 5. higher flux degree k=3 condensation on TPU
a5 = HydraulicNetworkAssembler(m5, flux_degree=3)
a5.compute_forms(p_bc_ex=lambda x: x[1])
s5 = Solver(a5); s5.assemble(); so5 = s5.solve()
a6 = HydraulicNetworkAssembler(m5, flux_degree=3)
a6.compute_forms(p_bc_ex=lambda x: x[1])
s6 = Solver(a6, options=SolverOptions(method="host_lu")); s6.assemble(); so6 = s6.solve()
err = max(float(np.max(np.abs(a.values-b.values))) for a,b in zip(so5,so6))
check("k3-condensation-vs-LU", err < 1e-8, f"err={err:.1e}")

# 6. sweep + global flux on TPU
asm = HydraulicNetworkAssembler(mesh)
asm.compute_forms(p_bc_ex=lambda x: x[1], R=np.ones(mesh.num_edges))
res = solve_sweep(asm, R=np.ones((4, mesh.num_edges)) * np.array([1,2,3,4])[:,None])
q0 = np.asarray(res.x[:,0])
check("sweep-linearity", np.allclose(q0 * np.array([1,2,3,4]), q0[0], rtol=1e-9), f"q0={q0}")

# 7. grid (fully cyclic) network vs host LU
Gg = ng_grid = None
from networks_fenicsx_tpu.network_generation import make_grid
Gg = make_grid(5, 4)
mg = NetworkMesh(Gg, N=2, color_strategy="fast")
ag1 = HydraulicNetworkAssembler(mg); ag1.compute_forms(p_bc_ex=lambda x: x[0])
sg1 = Solver(ag1); sg1.assemble(); sog1 = sg1.solve()
ag2 = HydraulicNetworkAssembler(mg); ag2.compute_forms(p_bc_ex=lambda x: x[0])
sg2 = Solver(ag2, options=SolverOptions(method="host_lu")); sg2.assemble(); sog2 = sg2.solve()
err = max(float(np.max(np.abs(a.values-b.values))) for a,b in zip(sog1,sog2))
check("grid-cyclic-vs-LU", err < 1e-8, f"err={err:.1e}")

# 8. float32 serving mode
af1 = HydraulicNetworkAssembler(m5); af1.compute_forms(p_bc_ex=lambda x: x[1])
sf1 = Solver(af1, options=SolverOptions(dtype="float32")); sf1.assemble(); sof1 = sf1.solve()
af2 = HydraulicNetworkAssembler(m5); af2.compute_forms(p_bc_ex=lambda x: x[1])
sf2 = Solver(af2); sf2.assemble(); sof2 = sf2.solve()
x32 = np.concatenate([f.values for f in sof1]); x64 = np.concatenate([f.values for f in sof2])
rel = float(np.max(np.abs(x64-x32))/np.max(np.abs(x64)))
check("float32-serving-mode", rel < 1e-4, f"rel={rel:.1e}")

# 9. committed exact-rational goldens reproduced on the TPU
import json
from pathlib import Path
for gname in ("y_source", "arterial_poiseuille"):
    gpath = Path(__file__).resolve().parent.parent / "tests" / "goldens" / f"{gname}.json"
    g = json.loads(gpath.read_text())
    spec = g["config"]
    if spec["graph"] == "tree":
        Gq = network_generation.make_tree(spec["n"], spec["H"], spec["W"])
    else:
        Gq = network_generation.make_arterial_tree(N=spec["n"], direction=np.asarray(spec["direction"]))
    mq = NetworkMesh(Gq, N=spec["N"])
    aq = HydraulicNetworkAssembler(mq)
    Rq = 1.0 / mq.edge_radius**4 if spec.get("R") == "poiseuille" else spec.get("R")
    aq.compute_forms(p_bc_ex=(lambda x: x[0]) if spec["p_bc"] == "x" else (lambda x: x[1]),
                     R=Rq, f=spec.get("f"))
    sq = Solver(aq); sq.assemble(); soq = sq.solve()
    lamq = {int(n_): float(v) for n_, v in zip(mq.bifurcation_values, soq[-1].values)}
    err = max(abs(lamq[int(k)] - v) for k, v in g["lam"].items())
    check(f"golden[{gname}]", err < 1e-10, f"lam-err={err:.1e}")

# 10. distributed lambda elimination (single chip, subtree plan exercised)
ad1 = HydraulicNetworkAssembler(m5); ad1.compute_forms(p_bc_ex=lambda x: x[1])
from networks_fenicsx_tpu.parallel import ShardedNetworkSolver
sd = ShardedNetworkSolver(ad1, schur_method="tree_dist")
sd.assemble(); sod = sd.solve()
ad2 = HydraulicNetworkAssembler(m5); ad2.compute_forms(p_bc_ex=lambda x: x[1])
sref = Solver(ad2); sref.assemble(); soref = sref.solve()
err = max(float(np.max(np.abs(a.values-b.values))) for a,b in zip(sod,soref))
check("tree-dist-single-chip", err < 1e-10 and sd.info.method == "schur_sharded_dist", f"err={err:.1e}")

# 11. binary VTU round trip of a TPU solution
import tempfile
from networks_fenicsx_tpu.io.vtk import VTK_LINE, read_vtu, write_vtu
td = Path(tempfile.mkdtemp())
vals = np.asarray(soref[-2].values)
pv = write_vtu(td / "p.vtu", m5.vertices, m5.cells, VTK_LINE, cell_data={"p": vals}, fmt="binary")
_, _, _, cd = read_vtu(pv)
check("binary-vtu-roundtrip", bool(np.array_equal(cd["p"], vals)), f"{pv.stat().st_size}B")

# 12. uniform closed-form path == generic per-cell path (same coefficients)
au = HydraulicNetworkAssembler(m5)
R_edge = np.linspace(1.0, 3.0, m5.num_edges)
au.compute_forms(p_bc_ex=lambda x: x[1], R=R_edge, f=1.7)     # uniform path (edge R, scalar f)
su = Solver(au); su.assemble(); sou = su.solve()
ac = HydraulicNetworkAssembler(m5)
ac.compute_forms(p_bc_ex=lambda x: x[1], R=R_edge[m5.cell_edge], f=1.7)  # per-cell: generic path
sc = Solver(ac); sc.assemble(); soc = sc.solve()
err = max(float(np.max(np.abs(a.values-b.values))) for a,b in zip(sou,soc))
check("uniform-vs-generic-path", err < 1e-10, f"err={err:.1e}")

# 13. blocked-sibling executor == general level-plan executor, on hardware
from networks_fenicsx_tpu import solver as _S
from networks_fenicsx_tpu.utils.config import SolverOptions as _SO
ab = HydraulicNetworkAssembler(m5)
ab.compute_forms(p_bc_ex=lambda x: x[0] + 0.5 * x[1], R=np.linspace(0.5, 2.0, m5.num_edges), f=0.9)
exb = _S.build_schur_executor(ab, _SO(), outputs="blocks", internal_layout=True)
exg = _S.build_schur_executor(ab, _SO(), outputs="blocks")
is_blocked = isinstance(exb, _S._BlockedExecutor)
ob = exb(*exb.prepare_args(*ab.schur_arguments(device=False))) if is_blocked else None
og = exg(*ab.schur_arguments())
if is_blocked:
    xb = _S._flatten_blocks_host(ob[0], ob[1], ob[2], m5.edge_color,
                                 edge_order=exb.edge_order, bif_order=exb.bif_order)
    xg = _S._flatten_blocks_host(og[0], og[1], og[2], m5.edge_color)
    err = float(np.max(np.abs(xb - xg)))
else:
    err = float("inf")
check("blocked-vs-general-executor", is_blocked and err < 1e-11, f"err={err:.1e}")

# 14. K-ary (K=3) blocked plan + per-cell-coefficient blocked path (round 3)
Gk = nx.DiGraph(); Gk.add_node(0, pos=np.array([0.,-1.,0.])); Gk.add_node(1, pos=np.array([0.,0.,0.]))
Gk.add_edge(0, 1); nid = 2; frontier = [(1, 0.0)]
for d in range(2):
    nf = []
    for node, x in frontier:
        for j in range(3):
            cx = x + (j - 1.0) * 3.0 ** (1 - d)
            Gk.add_node(nid, pos=np.array([cx, float(d + 1), 0.])); Gk.add_edge(node, nid)
            nf.append((nid, cx)); nid += 1
    frontier = nf
mk = NetworkMesh(Gk, N=3)
ak = HydraulicNetworkAssembler(mk)
ak.compute_forms(p_bc_ex=lambda x: x[1], R=np.linspace(0.5, 2.0, mk.num_cells), f=0.4)
exk = _S.build_schur_executor(ak, _SO(), outputs="blocks", internal_layout=True)
is_k = isinstance(exk, _S._BlockedExecutor)
if is_k:
    ok_ = exk(*exk.prepare_args(*ak.schur_arguments(device=False)))
    xk = _S._flatten_blocks_host(ok_[0], ok_[1], ok_[2], mk.edge_color,
                                 edge_order=exk.edge_order, bif_order=exk.bif_order)
    sref = Solver(ak, options=SolverOptions(method="host_lu")); sref.assemble(); solr = sref.solve()
    xr = np.concatenate([np.ravel(f.values) for f in solr])
    err = float(np.max(np.abs(xk - xr)))
else:
    err = float("inf")
check("kary-cellcoef-blocked", is_k and err < 1e-9, f"err={err:.1e}")

# 15. sharded blocked path on the single chip (D=1 degenerate mesh)
from networks_fenicsx_tpu.parallel import ShardedNetworkSolver
asb = HydraulicNetworkAssembler(m5)
asb.compute_forms(p_bc_ex=lambda x: x[1], R=np.linspace(1, 3, m5.num_edges))
ssb = ShardedNetworkSolver(asb); ssb.assemble(); sob = ssb.solve()
asr = HydraulicNetworkAssembler(m5)
asr.compute_forms(p_bc_ex=lambda x: x[1], R=np.linspace(1, 3, m5.num_edges))
ssr = Solver(asr); ssr.assemble(); sor = ssr.solve()
err = max(float(np.max(np.abs(a.values - b.values))) for a, b in zip(sob, sor))
check("sharded-blocked-1chip", ssb.info.method == "schur_sharded_blocked" and err < 1e-11,
      f"method={ssb.info.method} err={err:.1e}")

# 16. blocked executor at flux degree >= 2 (fixed condensed constants):
# engagement + agreement with host LU, per-edge R and nonzero source
ak = HydraulicNetworkAssembler(m5, flux_degree=2)
ak.compute_forms(p_bc_ex=lambda x: x[1], f=0.4, R=np.linspace(0.5, 2.0, m5.num_edges))
exk2 = _S.build_schur_executor(ak, _SO(), outputs="blocks", internal_layout=True)
is_bk = isinstance(exk2, _S._BlockedExecutor)
sk = Solver(ak); sk.assemble(); sok = sk.solve()
ar = HydraulicNetworkAssembler(m5, flux_degree=2)
ar.compute_forms(p_bc_ex=lambda x: x[1], f=0.4, R=np.linspace(0.5, 2.0, m5.num_edges))
sr = Solver(ar, options=SolverOptions(method="host_lu")); sr.assemble(); sor = sr.solve()
err = max(float(np.max(np.abs(a.values - b.values))) for a, b in zip(sok, sor))
check("blocked-degree2", is_bk and err < 1e-9, f"blocked={is_bk} err={err:.1e}")

# 17. lattice DCT exactness AT SCALE on the chip (CPU tests cannot see
# this: transforms are exact f64 there; on TPU an f32-transform
# regression stalls the residual at ~5e-6 on a 128^2 lattice)
from networks_fenicsx_tpu.solver import _GridPlan as _GP
Gl = make_grid(128, 128, arrays=True)
ml = NetworkMesh(Gl, N=1, color_strategy="fast")
al = HydraulicNetworkAssembler(ml)
al.compute_forms(p_bc_ex=lambda x: x[0], R=1.0)
exl = _S.build_schur_executor(
    al, _SO(schur_method="dct"), outputs="blocks", internal_layout=True
)
is_gl = isinstance(getattr(exl, "blocked_plan", None), _GP)
outl = exl(*jax.device_put(exl.prepare_args(*al.schur_arguments(device=False))))
rel_l = float(outl[4]) / max(float(outl[5]), 1e-300)
check("lattice-dct-exact-128", is_gl and rel_l < 1e-10,
      f"grid_plan={is_gl} rel_residual={rel_l:.1e}")

# 18. strip-sharded lattice executor on the single chip (D=1 degenerate)
Gsg = make_grid(9, 7, arrays=True)
msg = NetworkMesh(Gsg, N=2, color_strategy="fast")
asg = HydraulicNetworkAssembler(msg)
asg.compute_forms(p_bc_ex=lambda x: x[0], f=0.4, R=1.5)
ssg = ShardedNetworkSolver(asg); ssg.assemble(); sog = ssg.solve()
asr2 = HydraulicNetworkAssembler(msg)
asr2.compute_forms(p_bc_ex=lambda x: x[0], f=0.4, R=1.5)
ssr2 = Solver(asr2, options=SolverOptions(method="host_lu")); ssr2.assemble(); sor2 = ssr2.solve()
err = max(float(np.max(np.abs(a.values - b.values))) for a, b in zip(sog, sor2))
check("sharded-grid-1chip", ssg.info.method == "schur_sharded_grid" and err < 1e-10,
      f"method={ssg.info.method} err={err:.1e}")

# 19. factor-reuse pairs vs the fused solvers (forest + lattice)
from networks_fenicsx_tpu.solver import (
    build_blocked_factorization, build_grid_factorization,
)
aff = HydraulicNetworkAssembler(m5)
Rff = np.linspace(0.5, 2.0, m5.num_edges)
aff.compute_forms(p_bc_ex=lambda x: x[1], f=0.7, R=Rff)
facf = build_blocked_factorization(aff)
stf = facf.factor(Rff)
argsf = aff.schur_arguments(device=False)
xf = facf.solution_vector(facf.solve(stf, argsf[1], argsf[2], argsf[3]))
sff = Solver(aff); sff.assemble(); sff.solve()
reff = np.asarray(sff.solution_vector())
errf = float(np.max(np.abs(xf - reff)) / max(1.0, np.abs(reff).max()))
agg = HydraulicNetworkAssembler(msg)
agg.compute_forms(p_bc_ex=lambda x: x[0], f=0.4, R=1.5)
facg = build_grid_factorization(agg)
stg = facg.factor(agg.schur_arguments(device=False)[0])
argsg = agg.schur_arguments(device=False)
xg = facg.solution_vector(facg.solve(stg, argsg[1], argsg[2], argsg[3]))
sgg = Solver(agg, options=SolverOptions(method="host_lu")); sgg.assemble(); sgg.solve()
refg = np.asarray(sgg.solution_vector())
errg = float(np.max(np.abs(xg - refg)) / max(1.0, np.abs(refg).max()))
check("factor-reuse-pairs", errf < 1e-11 and errg < 1e-10,
      f"forest={errf:.1e} lattice={errg:.1e}")

# 20b. level-scan elimination variant == unrolled, on the chip
a_sc = HydraulicNetworkAssembler(m5)
R_sc = np.linspace(0.5, 2.0, m5.num_edges)
a_sc.compute_forms(p_bc_ex=lambda x: x[1], f=0.4, R=R_sc)
s_sc = Solver(a_sc, options=SolverOptions(level_scan="on"))
s_sc.assemble(); s_sc.solve()
x_sc = np.asarray(s_sc.solution_vector())
a_un = HydraulicNetworkAssembler(m5)
a_un.compute_forms(p_bc_ex=lambda x: x[1], f=0.4, R=R_sc)
s_un = Solver(a_un); s_un.assemble(); s_un.solve()
x_un = np.asarray(s_un.solution_vector())
err_sc = float(np.max(np.abs(x_sc - x_un)) / max(1.0, np.abs(x_un).max()))
check("level-scan-vs-unrolled", err_sc < 1e-12, f"err={err_sc:.1e}")

# 20. unstructured sparse cycle-core elimination (MUMPS-generality path)
from networks_fenicsx_tpu.network_generation import make_random_network
from networks_fenicsx_tpu.solver import _plan_tree_elimination, attach_core_plan
Gu = make_random_network(800, keep=0.6, seed=17)
mu = NetworkMesh(Gu, N=2, color_strategy="fast")
rng_u = np.random.default_rng(2)
Ru = rng_u.uniform(0.5, 3.0, mu.num_edges)
au = HydraulicNetworkAssembler(mu)
au.compute_forms(p_bc_ex=lambda x: x[0], f=0.3, R=Ru)
plan_u = attach_core_plan(_plan_tree_elimination(au))
su = Solver(au); su.assemble(); su.solve()
xu = np.asarray(su.solution_vector())
au2 = HydraulicNetworkAssembler(mu)
au2.compute_forms(p_bc_ex=lambda x: x[0], f=0.3, R=Ru)
su2 = Solver(au2, options=SolverOptions(method="host_lu")); su2.assemble(); su2.solve()
xu2 = np.asarray(su2.solution_vector())
err_u = float(np.max(np.abs(xu - xu2)) / max(1.0, np.abs(xu2).max()))
check("unstructured-sparse-core", plan_u.core_plan is not None and err_u < 1e-10,
      f"err={err_u:.1e} stats={plan_u.core_plan.stats if plan_u.core_plan else None}")

# 27. composite arterio-venous perfusion bed (tree + lattice + venous):
# the structure-adaptive peel-then-core elimination on the chip
Gb = network_generation.make_vascular_bed(4, 32, 20, arrays=True)
mb = NetworkMesh(Gb, N=1, color_strategy="fast")
ab = HydraulicNetworkAssembler(mb)
Rb = 1.0 / mb.edge_radius**4
ab.compute_forms(p_bc_ex=lambda x: x[1], R=Rb)
sb = Solver(ab); sb.assemble(); sb.solve()
xb = np.asarray(sb.solution_vector())
ab2 = HydraulicNetworkAssembler(mb)
ab2.compute_forms(p_bc_ex=lambda x: x[1], R=Rb)
sb2 = Solver(ab2, options=SolverOptions(method="host_lu")); sb2.assemble(); sb2.solve()
xb2 = np.asarray(sb2.solution_vector())
err_b = float(np.max(np.abs(xb - xb2)) / max(1.0, np.abs(xb2).max()))
check("vascular-bed-composite", err_b < 1e-10, f"err={err_b:.1e}")

# 28. nested-dissection-ordered sparse core on the chip (forced on a
# small lattice so the ND numeric phase itself is exercised on TPU)
from networks_fenicsx_tpu.ops.core_elim import (
    nested_dissection_order,
    plan_core_elimination,
)
from networks_fenicsx_tpu.solver import (
    _plan_tree_elimination,
    _schur_solve,
    build_schur_executor,
)

Gn = network_generation.make_grid(40, 40, arrays=True)
mn = NetworkMesh(Gn, N=1, color_strategy="fast")
an = HydraulicNetworkAssembler(mn)
rng_n = np.random.default_rng(6)
Rn = rng_n.uniform(0.5, 2.0, mn.num_edges)
an.compute_forms(p_bc_ex=lambda x: x[0], R=Rn)
pn = _plan_tree_elimination(an)
nd_n = nested_dissection_order(np.asarray(pn.core_pairs), pn.core_size, leaf=8)
cpn = plan_core_elimination(
    np.asarray(pn.core_pairs), pn.core_size, dense_cutoff=64, kcap=64,
    order=nd_n, tail_stop=False,
)
on = SolverOptions(method="schur", schur_method="tree")
exn = build_schur_executor(an, on, _tree_plan=pn._replace(core_plan=cpn))
xn, infon = _schur_solve(an, on, executor=exn)
an2 = HydraulicNetworkAssembler(mn)
an2.compute_forms(p_bc_ex=lambda x: x[0], R=Rn)
sn2 = Solver(an2, options=SolverOptions(method="host_lu")); sn2.assemble(); sn2.solve()
xn2 = np.asarray(sn2.solution_vector())
err_n = float(np.max(np.abs(np.asarray(xn) - xn2)) / max(1.0, np.abs(xn2).max()))
check("nested-dissection-core", cpn is not None and cpn.stats["rounds"] > 0
      and err_n < 1e-10, f"err={err_n:.1e} stats={cpn.stats if cpn else None}")

# 29. supernodal multifrontal tail on the chip (forced tiny fronts on the
# same 40² lattice so the extend-add scatter chain + per-front Cholesky
# run on TPU; see tests/test_core_elim.py::test_supernodal_front_tail_forced)
cps = plan_core_elimination(
    np.asarray(pn.core_pairs), pn.core_size, dense_cutoff=64, kcap=24,
    order=nd_n, dense_cap=16, supernodal_tail=True, front_max=37,
    tail_stop=False,
)
if cps is None or not cps.fronts:
    check("supernodal-front-tail", False, f"planner gave no fronts: {cps}")
else:
    exs = build_schur_executor(an, on, _tree_plan=pn._replace(core_plan=cps))
    xs, infos = _schur_solve(an, on, executor=exs)
    err_s = float(np.max(np.abs(np.asarray(xs) - xn2)) / max(1.0, np.abs(xn2).max()))
    check("supernodal-front-tail", infos.converged and err_s < 1e-10,
          f"err={err_s:.1e} fronts={len(cps.fronts)} max={cps.stats['front_max']}")

n_fail = sum(1 for _,ok,_ in results if not ok)
print(f"\n{len(results)-n_fail}/{len(results)} TPU validations passed")
# Machine-readable artifact: bench.py embeds this in its detail block so
# on-chip validation claims are artifact-backed, not prose.
import json, pathlib, subprocess
rev = "unknown"
try:
    rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True, timeout=10,
                         cwd=pathlib.Path(__file__).resolve().parent.parent
                         ).stdout.strip() or "unknown"
except Exception:
    pass
pathlib.Path(__file__).resolve().parent.parent.joinpath("TPU_VALIDATE.json").write_text(
    json.dumps({
        "checks_passed": len(results) - n_fail,
        "checks_total": len(results),
        "failed": [name for name, ok, _ in results if not ok],
        "backend": jax.default_backend(),
        "git_rev": rev,
        "unix_time": int(time.time()),
    }, indent=1) + "\n")
sys.exit(1 if n_fail else 0)
