// Native multithreaded voxelizer.
//
// Host-side counterpart of the reference's native voxelization machinery
// (the per-cell BVH point-query loop, cem-app/src/solver/runner.rs:566-676,
// backed by parry3d colliders). Python orchestrates; this kernel evaluates
// posed analytic shapes over every lattice cell center with OpenMP across
// x-slabs, writing the compressed material-index buffer directly.
//
// Shape containment math mirrors fdtd_tpu/scene/shapes.py exactly (SDF <= 0
// convention); first-inserted entity wins contested cells, like the Python
// path. Exposed via a C ABI for ctypes (no pybind11 in this environment).
//
// Build: see fdtd_tpu/native.py (cc -O3 -march=native -fopenmp -shared).

#include <cmath>
#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

enum ShapeKind : int32_t {
    BALL = 0,      // params: radius
    CUBOID = 1,    // params: hx, hy, hz
    CYLINDER = 2,  // params: half_height, radius
    HALFSPACE = 3, // params: nx, ny, nz (unit normal)
    QUAD = 4,      // params: hx, hy, half_thickness
};

struct Entity {
    int32_t kind;
    int32_t _pad0;  // explicit padding: layout must match fdtd_tpu/native.py
    // rotation matrix (world->local is the transpose of local->world),
    // stored row-major local->world; translation in world
    double rot[9];
    double trans[3];
    double params[4];
    uint16_t material_id;
    uint16_t _pad1[3];
};
static_assert(sizeof(Entity) == 144, "Entity ABI layout drifted");

inline void world_to_local(const Entity& e, const double* pw, double* pl) {
    const double d0 = pw[0] - e.trans[0];
    const double d1 = pw[1] - e.trans[1];
    const double d2 = pw[2] - e.trans[2];
    // R^T * d (R is local->world)
    pl[0] = e.rot[0] * d0 + e.rot[3] * d1 + e.rot[6] * d2;
    pl[1] = e.rot[1] * d0 + e.rot[4] * d1 + e.rot[7] * d2;
    pl[2] = e.rot[2] * d0 + e.rot[5] * d1 + e.rot[8] * d2;
}

inline bool contains(const Entity& e, const double* pw) {
    double p[3];
    world_to_local(e, pw, p);
    switch (e.kind) {
        case BALL: {
            const double r = e.params[0];
            return p[0] * p[0] + p[1] * p[1] + p[2] * p[2] <= r * r;
        }
        case CUBOID: {
            return std::fabs(p[0]) <= e.params[0] &&
                   std::fabs(p[1]) <= e.params[1] &&
                   std::fabs(p[2]) <= e.params[2];
        }
        case CYLINDER: {
            const double hh = e.params[0], r = e.params[1];
            return std::fabs(p[1]) <= hh &&
                   p[0] * p[0] + p[2] * p[2] <= r * r;
        }
        case HALFSPACE: {
            return e.params[0] * p[0] + e.params[1] * p[1] +
                       e.params[2] * p[2] <= 0.0;
        }
        case QUAD: {
            return std::fabs(p[0]) <= e.params[0] &&
                   std::fabs(p[1]) <= e.params[1] &&
                   std::fabs(p[2]) <= e.params[2];
        }
        default:
            return false;
    }
}

}  // namespace

extern "C" {

// Lattice point i maps to world via p_w = R_w * (i * dx) + origin, with R_w
// the volume rotation (row-major 3x3) — matching
// CoordinateTransforms.solver_to_world (fdtd_tpu/scene/transform.py).
//
// entities: packed array of Entity (see struct); n_entities entries.
// out: nx*ny*nz uint16, PRE-FILLED with the default material id (0).
// Returns the number of assigned cells.
int64_t fdtd_voxelize(
    const Entity* entities, int32_t n_entities,
    int32_t nx, int32_t ny, int32_t nz,
    const double* dx,      // 3
    const double* origin,  // 3
    const double* rot_w,   // 9 row-major volume rotation (local->world)
    uint16_t* out) {
    int64_t assigned = 0;

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 1) reduction(+ : assigned)
#endif
    for (int32_t ix = 0; ix < nx; ++ix) {
        const double sx = ix * dx[0];
        for (int32_t iy = 0; iy < ny; ++iy) {
            const double sy = iy * dx[1];
            uint16_t* row = out + (static_cast<int64_t>(ix) * ny + iy) * nz;
            for (int32_t iz = 0; iz < nz; ++iz) {
                const double sz = iz * dx[2];
                double pw[3] = {
                    rot_w[0] * sx + rot_w[1] * sy + rot_w[2] * sz + origin[0],
                    rot_w[3] * sx + rot_w[4] * sy + rot_w[5] * sz + origin[1],
                    rot_w[6] * sx + rot_w[7] * sy + rot_w[8] * sz + origin[2],
                };
                for (int32_t k = 0; k < n_entities; ++k) {
                    if (contains(entities[k], pw)) {
                        row[iz] = entities[k].material_id;
                        ++assigned;
                        break;  // first-inserted entity wins
                    }
                }
            }
        }
    }
    return assigned;
}

int32_t fdtd_native_version() { return 1; }

int32_t fdtd_native_threads() {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
