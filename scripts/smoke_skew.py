"""Quick dev smoke for the level-bucketed / one-hot BSR path (skewed BA).

Run: JAX_PLATFORMS=cpu python scripts/smoke_skew.py
"""
import numpy as np

from thallo_tpu.models import bundle_adjustment as ba


def skewed_inputs(n_cams=8, n_pts=300, alpha=1.2, max_deg=60, seed=0):
    rng = np.random.RandomState(seed)
    deg = np.clip((rng.pareto(alpha, n_pts) + 1).astype(int), 2, max_deg)
    base, _ = ba.synthetic_inputs(n_cameras=n_cams, n_points=n_pts,
                                  obs_per_point=2, seed=seed + 3)
    cams, pts = base["cameras"], base["points"]

    def project(cam, pt):
        aa, t = cam[0:3], cam[3:6]
        theta = np.linalg.norm(aa)
        if theta > 1e-12:
            w = aa / theta
            pp = (pt * np.cos(theta) + np.cross(w, pt) * np.sin(theta)
                  + w * np.dot(w, pt) * (1 - np.cos(theta)))
        else:
            pp = pt + np.cross(aa, pt)
        pp = pp + t
        cd = np.array([-pp[0] / pp[2], -pp[1] / pp[2]])
        r2 = cd @ cd
        return cd * cam[6] * (1.0 + r2 * (cam[7] + cam[8] * r2))

    oc, op, obs = [], [], []
    for j in range(n_pts):
        k = int(deg[j])
        for c in rng.choice(n_cams, size=k, replace=(k > n_cams)):
            oc.append(c)
            op.append(j)
            obs.append(project(cams[c].astype(np.float64),
                               pts[j].astype(np.float64)))
    cams0 = cams + 1e-3 * rng.randn(*cams.shape).astype(np.float32)
    pts0 = pts + 1e-2 * rng.randn(*pts.shape).astype(np.float32)
    ins = {"cameras": cams0, "points": pts0,
           "observations": np.asarray(obs, np.float32),
           "oToC": np.asarray(oc, np.int32),
           "oToP": np.asarray(op, np.int32)}
    return ins, {"C": n_cams, "P": n_pts, "O": len(obs)}


if __name__ == "__main__":
    spec = ba.make_spec()
    ins, meta = ba.synthetic_inputs(n_cameras=6, n_points=80,
                                    obs_per_point=4, seed=1)
    sizes = {"C": 6, "P": 80, "O": meta["n_obs"]}
    p = spec.plan(sizes, solver="levenberg_marquardt")
    p.init(ins)
    c0 = p.cost()
    for _ in range(8):
        p.step()
    print("uniform BA cost", c0, "->", p.cost())

    ins2, sizes2 = skewed_inputs(n_cams=16, n_pts=3000)
    print("skew: max pt deg", int(np.bincount(ins2["oToP"]).max()),
          "O", sizes2["O"])
    spec2 = ba.make_spec()
    p2 = spec2.plan(sizes2, solver="levenberg_marquardt")
    p2.init(ins2)
    bsrs = [c.get("bsr") for c in p2._prep["consts"] if isinstance(c, dict)]
    b = [x for x in bsrs if x is not None]
    print("bsr active:", len(b))
    if b:
        g = b[0]
        print("tables:", [tuple(pm.shape) for pm in g.perms],
              "sels:", [None if s is None else tuple(s.shape)
                        for s in g.row_sels],
              "onehot:", [None if x is None else tuple(x.shape)
                          for x in g.oh_idxs])
        print("pairs:", g.pairs)
    c0 = p2.cost()
    for _ in range(10):
        p2.step()
    print("skew BA cost", c0, "->", p2.cost())
