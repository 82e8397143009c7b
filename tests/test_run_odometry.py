"""End-to-end: synthetic mcap bag -> offline runner -> TUM trajectory."""

import os

import numpy as np
import pytest

from kinematic_icp_tpu import run_odometry
from kinematic_icp_tpu.utils import synthetic
from kinematic_icp_tpu.utils.evaluation import ate_rmse
from kinematic_icp_tpu.utils.io.tum import read_tum


NUM_FRAMES = 15


@pytest.fixture(scope="module")
def bag(tmp_path_factory):
    d = tmp_path_factory.mktemp("bags")
    path = str(d / "drive.mcap")
    seq = synthetic.make_sequence(NUM_FRAMES)
    synthetic.write_sequence_to_mcap(seq, path)
    return path, seq


class TestRunOdometry:
    def test_full_pipeline(self, bag):
        path, seq = bag
        out = run_odometry.main([
            path, "--max-points", "8192", "--no-progress"])
        assert os.path.exists(out)
        assert out.endswith("drive_kinematic_icp_poses_tum.txt")
        stamps, poses = read_tum(out)
        # first frame is stationary-gated away by the identity delta;
        # poses recorded from the first registered frame on
        assert len(poses) == NUM_FRAMES
        assert np.all(np.isfinite(stamps))
        # trajectory should track ground truth better than raw odometry drift
        gt = seq["gt_poses"][:len(poses)]
        ate = ate_rmse(gt, poses, align=False)
        dead = [np.eye(4)]
        for rel in seq["rel_odometry"][1:]:
            dead.append(dead[-1] @ rel)
        ate_dead = ate_rmse(seq["gt_poses"], dead, align=False)
        assert ate < max(0.05, ate_dead), (ate, ate_dead)

    def test_max_frames(self, bag, tmp_path):
        path, _ = bag
        out = run_odometry.main([
            path, "--max-frames", "5", "--output-dir", str(tmp_path),
            "--max-points", "8192", "--no-progress"])
        stamps, poses = read_tum(out)
        assert len(poses) == 5

    def test_visualize_writes_standalone_html(self, bag, tmp_path):
        path, _ = bag
        run_odometry.main([
            path, "--max-frames", "5", "--output-dir", str(tmp_path),
            "--max-points", "8192", "--no-progress", "--visualize"])
        html = tmp_path / "drive_kinematic_icp_view.html"
        assert html.exists()
        text = html.read_text()
        # standalone: no external assets, both rviz-equivalent layers present
        assert "http" not in text.split("<script>")[1]
        assert '"local_map"' in text and '"trajectory"' in text


class TestEvaluateCLI:
    def test_ate_rpe_between_tum_files(self, tmp_path, capsys):
        from kinematic_icp_tpu import evaluate
        from kinematic_icp_tpu.utils.io.tum import write_tum
        rng = np.random.default_rng(0)
        poses, ref = [], []
        T = np.eye(4)
        for i in range(30):
            T = T.copy()
            T[0, 3] += 0.1
            ref.append((float(i) * 0.1, T))
            Te = T.copy()
            Te[:3, 3] += rng.normal(0, 0.01, 3)
            # slightly offset stamps: association must still match
            poses.append((float(i) * 0.1 + 0.003, Te))
        write_tum(str(tmp_path / "ref.txt"), ref)
        write_tum(str(tmp_path / "est.txt"), poses)
        r = evaluate.main([str(tmp_path / "est.txt"),
                           str(tmp_path / "ref.txt"), "--no-align"])
        assert r["matched_poses"] == 30
        assert 0 < r["ate_rmse_m"] < 0.05
        assert r["rpe_trans_m"] < 0.1
        out = capsys.readouterr().out
        assert "ATE RMSE" in out


class TestViewer:
    def test_layers_and_pose_translation_extraction(self, tmp_path):
        from kinematic_icp_tpu.utils.viewer import write_html_viewer
        rng = np.random.default_rng(0)
        poses = np.tile(np.eye(4, dtype=np.float64), (7, 1, 1))
        poses[:, 0, 3] = np.arange(7)
        out = write_html_viewer(
            str(tmp_path / "v.html"),
            local_map=rng.normal(size=(50, 3)),
            keypoints=rng.normal(size=(5, 3)),
            trajectory=poses,
            voxel_grid=rng.normal(size=(4, 2, 3)))
        text = open(out).read()
        for name in ("local_map", "keypoints", "trajectory", "voxel_grid"):
            assert f'"{name}"' in text
        assert "6.0" in text  # trajectory x translations made it into data

    def test_empty_raises(self, tmp_path):
        from kinematic_icp_tpu.utils.viewer import write_html_viewer
        with pytest.raises(ValueError):
            write_html_viewer(str(tmp_path / "v.html"),
                              local_map=np.zeros((0, 3)))
