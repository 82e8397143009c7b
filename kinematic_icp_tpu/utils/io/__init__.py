"""Ingestion/serialization: TUM trajectories, mcap bags, ROS message codecs."""
