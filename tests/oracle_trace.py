"""Sequential scalar oracle of the reference's cast_rays bounce loop.

An independent per-ray, per-bounce numpy port of scene::cast_rays
(reference /root/reference/src/scene.cpp:50-183) and the boundary physics
(src/ray.cpp:11-97), structured like the C++ (one path at a time, explicit
if/else control flow, brute-force closest-hit per query) rather than like
the vectorised lax.scan in models/simulator.py. It consumes the SAME
pre-drawn random stream (physics.draw_bounce_randoms), so
tests/test_trace_oracle.py can assert the full (D, N) segment tensor of
trace_paths against it field by field — any transcription error in the
bounce composition (wrong media's attenuation, fuzz applied to the wrong
point, roulette off by a branch, ...) shows up as a hard mismatch.

All arithmetic is float32 (np.float32 scalars under NEP 50 stay float32) so
discrete decisions (hit, TIR, roulette) land on the same side as the XLA f32
path except for genuine ulp-threshold races.
"""

from __future__ import annotations

import numpy as np

F = np.float32

# material columns (src/mesh.h:7-10 order)
IMPEDANCE, ATTENUATION, MU0, MU1, SIGMA, SPECULARITY, SHININESS, THICKNESS = range(8)


def _norm(v):
    n = np.sqrt(F(max(float(v @ v), 0.0)))
    return v / F(max(n, 1e-30))


def _closest_hit(origin, seg_vec, tris, eps=F(1e-9)):
    """Scalar brute-force closest hit, t in (0,1) along seg_vec — the
    sequential equivalent of Bullet's rayTest (src/scene.cpp:115-117) with
    both-sided triangles; first minimum wins (matches argmin)."""
    best_t = F(2.0)
    best_i = -1
    for i in range(tris.shape[0]):
        v0 = tris[i, 0]
        e1 = tris[i, 1] - tris[i, 0]
        e2 = tris[i, 2] - tris[i, 0]
        pvec = np.cross(seg_vec, e2)
        det = F(e1 @ pvec)
        if abs(det) <= eps:
            continue
        inv_det = F(1.0) / det
        tvec = origin - v0
        u = F(tvec @ pvec) * inv_det
        if u < 0.0:
            continue
        qvec = np.cross(tvec, e1)
        v = F(seg_vec @ qvec) * inv_det
        if v < 0.0 or u + v > 1.0:
            continue
        t = F(e2 @ qvec) * inv_det
        if t <= 0.0 or t >= 1.0:
            continue
        if t < best_t:
            best_t = t
            best_i = i
    return best_t, best_i


def _unit_vector_from_disc(u_a, u_r, v, cos_theta):
    """Scalar port of the perturbed-normal construction
    (src/ray.cpp:167-211: disc sample + component swap)."""
    a = u_a * F(2.0 * np.pi)
    r = F(0.5) * np.sqrt(u_r)
    px = r * np.cos(a)
    py = r * np.sin(a)
    p = F(max(px * px + py * py, 1e-12))

    vx, vy, vz = v[0], v[1], v[2]
    flag = abs(vx) > abs(vy)
    if flag:
        vx, vy = vy, vx
    b = F(max(1.0 - vx * vx, 1e-12))
    radicand = F(max((F(1.0) - cos_theta * cos_theta) / (p * b), 1e-20))
    c = np.sqrt(radicand)
    px = px * c
    py = py * c
    d = cos_theta - vx * px
    wx = vx * cos_theta - b * px
    wy = vy * d + vz * py
    wz = vz * d - vy * py
    if flag:
        wx, wy = wy, wx
    return np.array([wx, wy, wz], np.float32)


def trace_oracle(
    positions,       # (R, 3) element positions
    directions,      # (R, 3) element directions
    materials,       # (M, 8)
    tris,            # (T, 3, 3)
    tri_mesh_id,     # (T,)
    mesh_mat_inside,  # (Mm,)
    mesh_mat_outside,
    mesh_is_vascular,
    spacing,         # (3,)
    starting_material: int,
    draws,           # dict of (D, N) arrays from physics.draw_bounce_randoms
    cfg,
):
    """Returns dict of (D, N) arrays matching trace_paths' segment tensor."""
    positions = np.asarray(positions, np.float32)
    directions = np.asarray(directions, np.float32)
    materials = np.asarray(materials, np.float32)
    tris = np.asarray(tris, np.float32)
    tri_mesh_id = np.asarray(tri_mesh_id)
    spacing = np.asarray(spacing, np.float32)
    draws = {k: np.asarray(v, np.float32) for k, v in draws.items()}

    n_rays = positions.shape[0]
    s = cfg.samples_per_element
    n = n_rays * s
    d_max = cfg.max_depth
    freq = F(cfg.transducer_frequency)
    eps = F(cfg.intensity_epsilon)

    out = {
        "from": np.zeros((d_max, n, 3), np.float32),
        "to": np.zeros((d_max, n, 3), np.float32),
        "direction": np.zeros((d_max, n, 3), np.float32),
        "reflected": np.zeros((d_max, n), np.float32),
        "initial": np.zeros((d_max, n), np.float32),
        "attenuation": np.zeros((d_max, n), np.float32),
        "distance": np.zeros((d_max, n), np.float32),
        "media_id": np.zeros((d_max, n), np.int32),
        "valid": np.zeros((d_max, n), bool),
    }

    for path in range(n):
        ray_i = path // s
        frm = positions[ray_i].copy()
        dire = directions[ray_i].copy()
        media = int(starting_material)
        media_outside = -1
        intensity = F(cfg.initial_intensity) / F(s)
        distance_mm = F(0.0)
        alive = True

        for depth in range(d_max):
            if not alive:
                break
            att = materials[media, ATTENUATION]
            # max_ray_length incl. the x-frequency quirk (src/ray.cpp:110-113)
            i_safe = F(max(intensity, eps * F(1e-3)))
            r_length = F(10.0) * np.log(eps / i_safe) / (-att) * freq
            origin = frm + F(cfg.ray_start_offset) * dire
            # enlarge(): mm/100 with per-axis spacing (src/scene.cpp:292-298)
            dest = frm + (r_length / F(100.0)) * spacing * dire
            seg_vec = dest - origin

            t, tri_i = _closest_hit(origin, seg_vec, tris)
            hit = tri_i >= 0

            if not hit:
                # terminal segment to max length (src/scene.cpp:160-165)
                out["from"][depth, path] = frm
                out["to"][depth, path] = dest
                out["direction"][depth, path] = dire
                out["initial"][depth, path] = intensity
                out["attenuation"][depth, path] = att
                out["distance"][depth, path] = distance_mm
                out["media_id"][depth, path] = media
                out["valid"][depth, path] = True
                break

            point = origin + t * seg_vec
            e1 = tris[tri_i, 1] - tris[tri_i, 0]
            e2 = tris[tri_i, 2] - tris[tri_i, 0]
            face_n = _norm(np.cross(e1, e2))
            if F(face_n @ seg_vec) > 0.0:
                face_n = -face_n

            mesh = int(tri_mesh_id[tri_i])
            m_in = int(mesh_mat_inside[mesh])
            m_out = int(mesh_mat_outside[mesh])
            vascular = bool(mesh_is_vascular[mesh])

            # sub-surface penetration fuzz (src/scene.cpp:129-139)
            thick = materials[m_in, THICKNESS]
            q = abs(draws["q_normal"][depth, path] * thick)
            inside_point = point + q * dire

            # travel to the boundary (src/scene.cpp:140 -> src/ray.cpp:99-103)
            dvec = np.abs(frm - inside_point) * spacing
            dist_mm = np.sqrt(F(max(float(dvec @ dvec), 0.0))) * F(10.0)
            intensity_travelled = intensity * np.exp(
                -att * dist_mm * F(0.01) * freq
            )

            # --- hit_boundary (src/ray.cpp:11-97) ---
            # vascular media state machine (src/ray.cpp:14-47)
            if media_outside >= 0:
                if vascular:  # leaving the vessel
                    mat_after, out_after = media_outside, -1
                else:  # organ boundary while inside a vessel
                    mat_after = media
                    out_after = m_out if media_outside == m_in else m_in
            else:
                if vascular:  # entering a vessel
                    mat_after, out_after = m_in, media
                elif cfg.bug_compat_material_transition:
                    mat_after, out_after = m_in, -1
                else:
                    mat_after = m_out if media == m_in else m_in
                    out_after = -1

            shin = materials[mat_after, SHININESS]
            random_angle = draws["angle_u"][depth, path] ** (
                F(1.0) / (np.floor(shin) + F(1.0))
            )
            random_normal = _unit_vector_from_disc(
                draws["axis_u"][depth, path],
                draws["radius_u"][depth, path],
                face_n,
                random_angle,
            )
            incidence = abs(F(dire @ random_normal))

            z1 = materials[media, IMPEDANCE]
            z2 = materials[mat_after, IMPEDANCE]
            ratio = z1 / z2
            refr_sq = F(1.0) - ratio * ratio * (F(1.0) - incidence * incidence)
            tir = refr_sq < 0.0
            refr_angle = F(0.0) if tir else np.sqrt(F(max(refr_sq, 0.0)))

            refr_dir = _norm(
                ratio * dire + (ratio * incidence - refr_angle) * random_normal
            )
            refl_dir = _norm(dire + F(2.0) * incidence * random_normal)

            if tir:
                i_refl = intensity_travelled
            else:
                num = z1 * incidence - z2 * refr_angle
                den = z1 * incidence + z2 * refr_angle
                i_refl = intensity_travelled * (num / den) ** 2
            i_refr = intensity_travelled - i_refl

            spec = materials[mat_after, SPECULARITY]

            def powmax(base, e):
                return F(base) ** e if base > 0.0 else F(0.0)

            refr_term = F(0.0) if tir else powmax(F(dire @ refr_dir), spec)
            refl_term = powmax(F(dire @ refl_dir), spec)
            back = (refr_term + refl_term) * random_angle

            # Russian roulette (src/ray.cpp:85-94)
            x = draws["roulette_u"][depth, path]
            reflect = (i_refl / F(max(intensity_travelled, eps))) > x
            refl_int = i_refl if i_refl > eps else F(0.0)
            refr_int = i_refr if i_refr > eps else F(0.0)

            out["from"][depth, path] = frm
            out["to"][depth, path] = inside_point
            out["direction"][depth, path] = dire
            out["reflected"][depth, path] = back
            out["initial"][depth, path] = intensity
            out["attenuation"][depth, path] = att
            out["distance"][depth, path] = distance_mm
            out["media_id"][depth, path] = media
            out["valid"][depth, path] = True

            # continue with the roulette-chosen ray (src/scene.cpp:148-157)
            frm = point
            if reflect:
                new_int = refl_int
            else:
                new_int = refr_int
                media, media_outside = mat_after, out_after
            dire = refl_dir if reflect else refr_dir
            intensity = new_int
            distance_mm = distance_mm + dist_mm
            alive = new_int > eps

    return out
