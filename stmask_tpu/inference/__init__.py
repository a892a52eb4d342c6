from .candidates import Detections, detect_frame
from .pipeline import (build_video_scan, build_video_step,
                       build_video_step_batched, cast_params)
from .postprocess import postprocess_frame, results2json_videoseg
from .tracker import (FrameOutput, TrackState, init_state, track_step_simple,
                      track_step_tf)

__all__ = ['Detections', 'detect_frame', 'build_video_scan',
           'build_video_step', 'build_video_step_batched', 'cast_params',
           'postprocess_frame', 'results2json_videoseg', 'FrameOutput',
           'TrackState', 'init_state', 'track_step_simple', 'track_step_tf']
