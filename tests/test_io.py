"""Tests for the ingestion stack: CDR, messages, mcap, tf, timestamps."""

import io
import os

import numpy as np
import pytest

from kinematic_icp_tpu.utils.io.bag import (BagMultiplexer, BufferableBag,
                                            decode_message)
from kinematic_icp_tpu.utils.io.laserscan import project_laser
from kinematic_icp_tpu.utils.io.mcap import McapReader, McapWriter
from kinematic_icp_tpu.utils.io.messages import (Header, LaserScan, Odometry,
                                                 PointCloud2, PointFieldType,
                                                 TFMessage, Time,
                                                 TransformStamped)
from kinematic_icp_tpu.utils.io.tf import TransformBuffer
from kinematic_icp_tpu.utils.io.timestamps import TimeStampHandler
from kinematic_icp_tpu.utils.synthetic import planar_pose

RNG = np.random.default_rng(8)


class TestPointCloud2Codec:
    def test_roundtrip(self):
        pts = RNG.normal(size=(100, 3)).astype(np.float32)
        ts = RNG.uniform(0, 0.1, 100)
        msg = PointCloud2.from_xyz(pts, stamp=123.456, frame_id="lidar",
                                   timestamps=ts, timestamp_field="timestamp",
                                   timestamp_type=PointFieldType.FLOAT64)
        decoded = PointCloud2.decode(msg.encode())
        assert decoded.header.frame_id == "lidar"
        assert abs(decoded.header.stamp.to_sec() - 123.456) < 1e-6
        np.testing.assert_allclose(decoded.xyz(), pts, atol=0)
        np.testing.assert_allclose(decoded.field_array("timestamp"), ts,
                                   atol=0)

    def test_uint32_timestamp_field(self):
        pts = RNG.normal(size=(10, 3)).astype(np.float32)
        ts = (RNG.uniform(0, 0.1, 10) * 1e9).astype(np.uint32)
        msg = PointCloud2.from_xyz(pts, timestamps=ts, timestamp_field="t",
                                   timestamp_type=PointFieldType.UINT32)
        decoded = PointCloud2.decode(msg.encode())
        np.testing.assert_array_equal(decoded.field_array("t"), ts)

    def test_missing_field_none(self):
        msg = PointCloud2.from_xyz(RNG.normal(size=(5, 3)))
        assert msg.field_array("t") is None


class TestLaserScan:
    def test_roundtrip_and_projection(self):
        n = 360
        scan = LaserScan(
            header=Header(Time.from_sec(10.0), "laser"),
            angle_min=-np.pi, angle_max=np.pi,
            angle_increment=2 * np.pi / n, time_increment=1e-4,
            scan_time=n * 1e-4, range_min=0.1, range_max=30.0,
            ranges=RNG.uniform(1, 20, n).astype(np.float32),
            intensities=np.zeros(n, np.float32))
        decoded = LaserScan.decode(scan.encode())
        np.testing.assert_allclose(decoded.ranges, scan.ranges, atol=0)
        cloud = project_laser(decoded)
        xyz = cloud.xyz()
        assert len(xyz) == n  # all ranges valid here
        r = np.linalg.norm(xyz[:, :2], axis=1)
        np.testing.assert_allclose(r, scan.ranges, rtol=1e-5)
        np.testing.assert_allclose(xyz[:, 2], 0.0, atol=0)
        stamps = cloud.field_array("stamps")
        np.testing.assert_allclose(stamps, np.arange(n) * 1e-4, atol=1e-9)

    def test_projection_filters_invalid(self):
        scan = LaserScan(
            angle_min=0.0, angle_max=0.3, angle_increment=0.1,
            time_increment=0.0, scan_time=0.0, range_min=1.0, range_max=10.0,
            ranges=np.array([0.5, 5.0, np.inf, np.nan], np.float32),
            intensities=np.zeros(4, np.float32))
        cloud = project_laser(scan)
        assert cloud.width == 1


class TestTFAndOdometry:
    def test_tf_roundtrip(self):
        T = planar_pose(1.0, 2.0, 0.5)
        msg = TFMessage([TransformStamped.from_matrix(T, 5.0, "odom", "base")])
        decoded = TFMessage.decode(msg.encode())
        np.testing.assert_allclose(decoded.transforms[0].matrix(), T,
                                   atol=1e-12)
        assert decoded.transforms[0].header.frame_id == "odom"
        assert decoded.transforms[0].child_frame_id == "base"

    def test_odometry_roundtrip(self):
        msg = Odometry(header=Header(Time.from_sec(2.0), "odom"),
                       child_frame_id="base",
                       position=np.array([1.0, 2.0, 3.0]),
                       orientation=np.array([0.0, 0, 0, 1]),
                       pose_covariance=np.arange(36, dtype=np.float64))
        decoded = Odometry.decode(msg.encode())
        np.testing.assert_allclose(decoded.position, msg.position)
        np.testing.assert_allclose(decoded.pose_covariance,
                                   msg.pose_covariance)


class TestMcap:
    def test_roundtrip_memory(self):
        buf = io.BytesIO()
        w = McapWriter(buf)
        pts = RNG.normal(size=(20, 3)).astype(np.float32)
        cloud = PointCloud2.from_xyz(pts, stamp=1.5, frame_id="lidar")
        w.write_message("/points", "sensor_msgs/msg/PointCloud2",
                        cloud.encode(), int(1.5e9))
        tfm = TFMessage([TransformStamped.from_matrix(
            np.eye(4), 1.5, "odom", "base")])
        w.write_message("/tf", "tf2_msgs/msg/TFMessage", tfm.encode(),
                        int(1.5e9))
        w.close()

        buf.seek(0)
        r = McapReader(buf)
        msgs = list(r.messages())
        assert len(msgs) == 2
        assert msgs[0].channel.topic == "/points"
        assert msgs[0].schema.name == "sensor_msgs/msg/PointCloud2"
        decoded = decode_message(msgs[0])
        np.testing.assert_allclose(decoded.xyz(), pts, atol=0)
        assert abs(msgs[0].log_time_sec - 1.5) < 1e-9

    def test_count_from_summary_statistics(self):
        # the writer emits a summary section with a Statistics record;
        # count_messages must use it instead of rescanning, for plain and
        # chunk-compressed files alike
        for compression in ("", "lz4"):
            buf = io.BytesIO()
            w = McapWriter(buf, compression=compression)
            for i in range(7):
                w.write_message("/a", "tf2_msgs/msg/TFMessage",
                                TFMessage().encode(), i)
            for i in range(3):
                w.write_message("/b", "tf2_msgs/msg/TFMessage",
                                TFMessage().encode(), i)
            w.close()
            buf.seek(0)
            r = McapReader(buf)
            assert r._count_from_summary("/a") == 7
            assert r._count_from_summary("/b") == 3
            assert r._count_from_summary("/missing") == 0
            assert r.count_messages("/a") == 7
            # messages still iterate normally past the summary section
            buf.seek(8)
            assert len(list(r.messages(["/a"]))) == 7

    def test_count_falls_back_without_summary(self):
        buf = io.BytesIO()
        w = McapWriter(buf)
        for i in range(4):
            w.write_message("/a", "tf2_msgs/msg/TFMessage",
                            TFMessage().encode(), i)
        w.close()
        raw = bytearray(buf.getvalue())
        raw[-28:-20] = b"\x00" * 8  # zero footer.summary_start
        r = McapReader(io.BytesIO(bytes(raw)))
        assert r._count_from_summary("/a") is None
        assert r.count_messages("/a") == 4

    def test_truncated_file_yields_intact_prefix(self):
        buf = io.BytesIO()
        w = McapWriter(buf)
        for i in range(50):
            w.write_message("/a", "tf2_msgs/msg/TFMessage",
                            TFMessage().encode(), i)
        w.close()
        raw = buf.getvalue()
        # cut inside the message data section
        cut = raw[:int(len(raw) * 0.5)]
        r = McapReader(io.BytesIO(cut))
        with pytest.warns(UserWarning, match="truncated"):
            msgs = list(r.messages(["/a"]))
        assert 0 < len(msgs) < 50

    def test_topic_filter(self):
        buf = io.BytesIO()
        w = McapWriter(buf)
        for i in range(5):
            w.write_message("/a", "tf2_msgs/msg/TFMessage",
                            TFMessage().encode(), i)
            w.write_message("/b", "tf2_msgs/msg/TFMessage",
                            TFMessage().encode(), i)
        w.close()
        buf.seek(0)
        msgs = list(McapReader(buf).messages(["/a"]))
        assert len(msgs) == 5

    def test_bad_magic(self):
        with pytest.raises(ValueError):
            McapReader(io.BytesIO(b"not an mcap file...."))


class TestTransformBuffer:
    def test_static_and_dynamic_chain(self):
        tfb = TransformBuffer()
        ext = planar_pose(0.2, 0.0, 0.1)
        tfb.set_transform("base", "lidar", ext, 0.0, is_static=True)
        X0 = planar_pose(0, 0, 0)
        X1 = planar_pose(1.0, 0.0, 0.2)
        tfb.set_transform("odom", "base", X0, 0.0)
        tfb.set_transform("odom", "base", X1, 1.0)
        # interpolation at t=0.5
        T = tfb.lookup_transform("odom", "base", 0.5)
        assert abs(T[0, 3] - 0.5) < 1e-9
        # chain odom -> lidar
        T2 = tfb.lookup_transform("odom", "lidar", 1.0)
        np.testing.assert_allclose(T2, X1 @ ext, atol=1e-12)

    def test_delta_lookup(self):
        tfb = TransformBuffer()
        X0 = planar_pose(0, 0, 0)
        X1 = planar_pose(1.0, 0.5, 0.3)
        tfb.set_transform("odom", "base", X0, 10.0)
        tfb.set_transform("odom", "base", X1, 11.0)
        delta = tfb.lookup_delta_transform("base", 10.0, 11.0, "odom")
        np.testing.assert_allclose(delta, np.linalg.inv(X0) @ X1, atol=1e-9)

    def test_missing_frame_identity(self):
        tfb = TransformBuffer()
        T = tfb.lookup_transform("nope", "nothing")
        np.testing.assert_allclose(T, np.eye(4))


class TestTimeStampHandler:
    def _cloud(self, stamp, ts, field="t", ftype=PointFieldType.FLOAT64):
        pts = RNG.normal(size=(len(ts), 3)).astype(np.float32)
        return PointCloud2.from_xyz(pts, stamp=stamp, timestamps=ts,
                                    timestamp_field=field,
                                    timestamp_type=ftype)

    def test_end_stamped_normalization(self):
        h = TimeStampHandler()
        h.last_processed_stamp = 99.9
        ts = np.linspace(99.9, 100.0, 50)
        begin, end, norm = h.process_timestamps(self._cloud(100.0, ts))
        assert begin == 99.9
        assert abs(end - 100.0) < 1e-9
        np.testing.assert_allclose(norm, np.linspace(0, 1, 50), atol=1e-6)

    def test_begin_stamped_extends_end(self):
        h = TimeStampHandler()
        ts = np.linspace(100.0, 100.1, 50)
        begin, end, norm = h.process_timestamps(self._cloud(100.0, ts))
        assert abs(end - 100.1) < 1e-6
        assert h.last_processed_stamp == end

    def test_nanosecond_autodetect(self):
        h = TimeStampHandler()
        ts_ns = np.linspace(100.0e9, 100.1e9, 30)
        begin, end, norm = h.process_timestamps(
            self._cloud(100.1, ts_ns))
        np.testing.assert_allclose(norm[0], 0.0, atol=1e-6)
        np.testing.assert_allclose(norm[-1], 1.0, atol=1e-6)
        assert abs(end - 100.1) < 1e-6  # detected as end-stamped

    def test_missing_field_disables_deskew(self):
        h = TimeStampHandler()
        cloud = PointCloud2.from_xyz(RNG.normal(size=(10, 3)))
        cloud.header = Header(Time.from_sec(5.0), "lidar")
        begin, end, norm = h.process_timestamps(cloud)
        assert norm is None
        assert end == 5.0

    def test_last_field_wins(self):
        # two candidate fields: the later one is used (C++ loop semantics)
        pts = RNG.normal(size=(10, 3)).astype(np.float32)
        msg = PointCloud2.from_xyz(pts, stamp=1.0)
        # manually append two timestamp-ish fields pointing at same data
        from kinematic_icp_tpu.utils.io.messages import PointField
        # rebuild with a 'time' field only
        ts = np.linspace(0.9, 1.0, 10)
        msg = PointCloud2.from_xyz(pts, stamp=1.0, timestamps=ts,
                                   timestamp_field="time",
                                   timestamp_type=PointFieldType.FLOAT64)
        h = TimeStampHandler()
        _, _, norm = h.process_timestamps(msg)
        assert norm is not None


class TestBufferableBag:
    def _make_bag(self, path, n=20):
        from kinematic_icp_tpu.utils.synthetic import make_sequence, \
            write_sequence_to_mcap
        seq = make_sequence(n)
        write_sequence_to_mcap(seq, path)
        return seq

    def test_tf_lookahead(self, tmp_path):
        path = str(tmp_path / "test.mcap")
        self._make_bag(path)
        tfb = TransformBuffer()
        bag = BufferableBag(path, tfb, "/lidar_points", buffer_size=0.3)
        first = bag.pop_next_message()
        # by the time the first lidar message pops, tf must be populated
        # AHEAD of it (look-ahead window)
        assert tfb.frame_exists("base_link")
        assert tfb.frame_exists("lidar")
        t0 = first.log_time_sec
        T = tfb.lookup_transform("odom", "base_link", t0 + 0.2)
        assert np.all(np.isfinite(T))

    def test_multiplexer_chains(self, tmp_path):
        p1, p2 = str(tmp_path / "a.mcap"), str(tmp_path / "b.mcap")
        self._make_bag(p1, 5)
        self._make_bag(p2, 7)
        tfb = TransformBuffer()
        mux = BagMultiplexer()
        mux.add_bag(BufferableBag(p1, tfb, "/lidar_points"))
        mux.add_bag(BufferableBag(p2, tfb, "/lidar_points"))
        msgs = list(mux)
        assert len(msgs) == 12
        assert mux.message_count() == 12


class TestLz4:
    """Pure-python LZ4 codec (utils/io/lz4f.py) + lz4-chunked mcap."""

    def test_block_roundtrip(self):
        from kinematic_icp_tpu.utils.io import lz4f
        for data in (b"", b"x", b"hello world " * 100,
                     bytes(RNG.integers(0, 256, 5000, dtype=np.uint8))):
            assert lz4f.decompress_block(lz4f.compress_block(data)) == data

    def test_frame_roundtrip(self):
        from kinematic_icp_tpu.utils.io import lz4f
        data = bytes(RNG.integers(0, 256, 100_000, dtype=np.uint8))
        assert lz4f.decompress_frame(lz4f.compress_frame(data)) == data

    def test_decodes_match_reference_vectors(self):
        from kinematic_icp_tpu.utils.io import lz4f
        # hand-built block with a real back-reference: literals "abcd",
        # then match offset 4 length 8 -> "abcdabcdabcd"
        block = bytes([0x44, ord("a"), ord("b"), ord("c"), ord("d"),
                       0x04, 0x00])
        assert lz4f.decompress_block(block) == b"abcd" + b"abcd" * 2

    def test_block_linked_frame(self):
        # liblz4's LZ4F default (what rosbag2/mcap writers emit) links
        # blocks: a match in block 2 may reach back into block 1.
        from kinematic_icp_tpu.utils.io import lz4f
        import struct as st
        block1 = bytes([0x80]) + b"abcdefgh"       # 8 literals
        block2 = bytes([0x04, 0x08, 0x00])         # match offset 8, len 8
        frame = bytearray(st.pack("<I", lz4f.FRAME_MAGIC))
        frame += bytes([0x40, 0x40, 0x00])         # v1, LINKED, 64K, hc
        for b in (block1, block2):
            frame += st.pack("<I", len(b)) + b
        frame += st.pack("<I", 0)                  # EndMark
        assert lz4f.decompress_frame(bytes(frame)) == b"abcdefgh" * 2

        # the same cross-block reference in an INDEPENDENT frame is corrupt
        frame[4] = 0x60                            # v1, independent
        with pytest.raises(ValueError, match="history"):
            lz4f.decompress_frame(bytes(frame))

    def test_lz4_chunked_mcap_roundtrip(self):
        buf = io.BytesIO()
        w = McapWriter(buf, compression="lz4")
        pts = RNG.normal(size=(50, 3)).astype(np.float32)
        cloud = PointCloud2.from_xyz(pts, stamp=2.0, frame_id="lidar")
        for i in range(4):
            w.write_message("/points", "sensor_msgs/msg/PointCloud2",
                            cloud.encode(), int((2.0 + 0.1 * i) * 1e9))
        w.close()
        buf.seek(0)
        msgs = list(McapReader(buf).messages())
        assert len(msgs) == 4
        np.testing.assert_allclose(decode_message(msgs[0]).xyz(), pts,
                                   atol=0)

    def test_zstd_chunked_mcap_roundtrip(self):
        buf = io.BytesIO()
        w = McapWriter(buf, compression="zstd")
        for i in range(3):
            w.write_message("/tf", "tf2_msgs/msg/TFMessage",
                            TFMessage().encode(), i)
        w.close()
        buf.seek(0)
        assert len(list(McapReader(buf).messages())) == 3


class TestSqliteBag:
    """rosbag2 sqlite3 (.db3) storage parity (RosbagUtils.cpp:82-93)."""

    def test_roundtrip(self, tmp_path):
        from kinematic_icp_tpu.utils.io.sqlite_bag import (SqliteBagReader,
                                                           SqliteBagWriter)
        path = str(tmp_path / "fixture.db3")
        pts = RNG.normal(size=(30, 3)).astype(np.float32)
        cloud = PointCloud2.from_xyz(pts, stamp=1.0, frame_id="lidar")
        with SqliteBagWriter(path) as w:
            w.write_message("/lidar_points", "sensor_msgs/msg/PointCloud2",
                            cloud.encode(), int(1e9))
            w.write_message("/tf", "tf2_msgs/msg/TFMessage",
                            TFMessage().encode(), int(1.05e9))
        r = SqliteBagReader(path)
        msgs = list(r.messages())
        assert [m.channel.topic for m in msgs] == ["/lidar_points", "/tf"]
        assert msgs[0].schema.name == "sensor_msgs/msg/PointCloud2"
        np.testing.assert_allclose(decode_message(msgs[0]).xyz(), pts,
                                   atol=0)
        assert r.count_messages("/lidar_points") == 1
        # topic filter runs in SQL (WHERE topic_id IN ...)
        only = list(r.messages(["/tf"]))
        assert [m.channel.topic for m in only] == ["/tf"]
        assert list(r.messages(["/missing"])) == []
        r.close()

    def test_bufferable_bag_over_sqlite(self, tmp_path):
        from kinematic_icp_tpu.utils.io.bag import BufferableBag
        from kinematic_icp_tpu.utils.io.sqlite_bag import SqliteBagWriter
        from kinematic_icp_tpu.utils.io.tf import TransformBuffer
        path = str(tmp_path / "drive.db3")
        with SqliteBagWriter(path) as w:
            for i in range(6):
                t = 1.0 + 0.1 * i
                tfm = TFMessage([TransformStamped.from_matrix(
                    np.eye(4), t, "odom", "base")])
                w.write_message("/tf", "tf2_msgs/msg/TFMessage",
                                tfm.encode(), int(t * 1e9))
                cloud = PointCloud2.from_xyz(
                    RNG.normal(size=(10, 3)).astype(np.float32),
                    stamp=t, frame_id="lidar")
                w.write_message("/scan", "sensor_msgs/msg/PointCloud2",
                                cloud.encode(), int(t * 1e9))
        tf_buffer = TransformBuffer()
        bag = BufferableBag(path, tf_buffer, "/scan")
        assert bag.message_count() == 6
        msgs = list(bag)
        assert len(msgs) == 6
        # tf was bridged into the buffer while draining
        assert tf_buffer.frame_exists("base")
