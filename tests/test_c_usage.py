"""The analogue of the reference's Radient C include tests
(Tests/IncludeTest RadientEngineH_test.c: every interface must be usable
from plain C): compile a small C program against libdfx_native.so with gcc
and run the engine -> asset -> scene -> renderables flow end to end."""
import os
import shutil
import subprocess
import textwrap

import pytest

pytestmark = pytest.mark.skipif(shutil.which("gcc") is None,
                                reason="no C toolchain")

C_SRC = r"""
#include <stdint.h>
#include <stdio.h>

/* Radient public C API (native/src/radient_c.cpp) */
extern int64_t dfx_rt_engine_create(int32_t backend);
extern int32_t dfx_rt_create_mesh(int64_t eng, const float* pos,
                                  const float* nrm, const float* uv,
                                  int64_t nverts, const int32_t* idx,
                                  int64_t ntris, int64_t out[2]);
extern int64_t dfx_rt_create_material(int64_t eng, const float params[16]);
extern int64_t dfx_rt_scene_create(int64_t eng);
extern int32_t dfx_rt_node_create(int64_t scene, int32_t parent);
extern int32_t dfx_rt_node_set_mesh(int64_t scene, int32_t node,
                                    int64_t mesh, int64_t mat);
extern int64_t dfx_rt_update_gpu_resources(int64_t eng);
extern int32_t dfx_rt_asset_load_state(int64_t h);
extern int64_t dfx_rt_scene_renderables(int64_t scene, int32_t* nodes,
                                        int64_t* meshes, int64_t* mats,
                                        int64_t cap);
extern int32_t dfx_rt_release(int64_t h);

int main(void) {
    float pos[9] = {0, 0, 0, 1, 0, 0, 0, 1, 0};
    int32_t idx[3] = {0, 1, 2};
    int64_t out[2];
    int64_t eng = dfx_rt_engine_create(0);
    if (eng <= 0) return 1;
    if (dfx_rt_create_mesh(eng, pos, 0, 0, 3, idx, 1, out) != 0) return 2;
    int64_t mesh = out[0];
    int64_t mat = dfx_rt_create_material(eng, 0);
    int64_t scene = dfx_rt_scene_create(eng);
    int32_t node = dfx_rt_node_create(scene, -1);
    if (dfx_rt_node_set_mesh(scene, node, mesh, mat) != 0) return 3;
    if (dfx_rt_update_gpu_resources(eng) != 1) return 4;
    if (dfx_rt_asset_load_state(mesh) != 4 /* COMMITTED */) return 5;
    int32_t nodes[4]; int64_t meshes[4]; int64_t mats[4];
    if (dfx_rt_scene_renderables(scene, nodes, meshes, mats, 4) != 1) return 6;
    if (nodes[0] != node || meshes[0] != mesh) return 7;
    dfx_rt_release(scene);
    dfx_rt_release(mesh);
    dfx_rt_release(eng);
    printf("c-api-ok\n");
    return 0;
}
"""


def test_c_program_drives_the_api(tmp_path):
    from diligentfx_tpu.native.build import build
    lib = build()
    src = tmp_path / "use_api.c"
    src.write_text(textwrap.dedent(C_SRC))
    exe = tmp_path / "use_api"
    subprocess.run(["gcc", "-std=c99", str(src), str(lib),
                    f"-Wl,-rpath,{os.path.dirname(lib)}", "-o", str(exe)],
                   check=True)
    r = subprocess.run([str(exe)], capture_output=True, text=True)
    assert r.returncode == 0, (r.returncode, r.stdout, r.stderr)
    assert "c-api-ok" in r.stdout
