import json
import os

import numpy as np
import pytest

from light_transport_tpu.cli import main


def test_cli_simulate(capsys):
    rc = main(["simulate", "--preset", "demo", "--photons", "5000"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["photons"] == 5000
    assert abs(out["energy"] - 1.0) < 0.02


def test_cli_render(tmp_path, capsys):
    out = str(tmp_path / "img.png")
    rc = main(["render", "--preset", "lts", "--width", "12", "--height",
               "12", "--spp", "2", "--max-depth", "2", "--out", out])
    assert rc == 0
    assert os.path.exists(out) or os.path.exists(out + ".npy")


def test_cli_render_sharded(tmp_path):
    out = str(tmp_path / "img.png")
    rc = main(["render", "--preset", "lts", "--width", "8", "--height", "8",
               "--spp", "8", "--max-depth", "2", "--sharded", "--out", out])
    assert rc == 0


@pytest.mark.slow
def test_cli_simulate_checkpoint(tmp_path, capsys):
    ck = str(tmp_path / "run.npz")
    rc = main(["simulate", "--preset", "demo", "--photons", "4000",
               "--checkpoint", ck])
    assert rc == 0
    assert os.path.exists(ck)


def test_sphere_triangles_closed():
    from light_transport_tpu.scene.cornell import sphere_triangles
    from light_transport_tpu.scene.geometry import TriangleMesh

    tris = sphere_triangles(center=(1, 2, 3), radius=2.0, n_theta=24,
                            n_phi=48)
    mesh = TriangleMesh.build(tris, np.zeros(len(tris), np.int32))
    # total surface area approaches 4 pi r^2
    np.testing.assert_allclose(
        mesh.area().sum(), 4 * np.pi * 4.0, rtol=0.02
    )
    v = mesh.vertices() - np.asarray([1, 2, 3])
    r = np.linalg.norm(v, axis=-1)
    np.testing.assert_allclose(r, 2.0, atol=1e-6)
