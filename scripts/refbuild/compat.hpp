// OpenCV 3 -> 4 compatibility shims for building the UNMODIFIED reference
// library (/root/reference/RSLightFields) against the installed OpenCV 4.6.
// Force-included via g++ -include; the reference sources are not edited.
#pragma once
#include <opencv2/opencv.hpp>

#ifndef CV_LOAD_IMAGE_UNCHANGED
#define CV_LOAD_IMAGE_UNCHANGED cv::IMREAD_UNCHANGED
#endif
#ifndef CV_WINDOW_NORMAL
#define CV_WINDOW_NORMAL cv::WINDOW_NORMAL
#endif
#ifndef CV_WINDOW_AUTOSIZE
#define CV_WINDOW_AUTOSIZE cv::WINDOW_AUTOSIZE
#endif
#ifndef CV_GRAY2RGB
#define CV_GRAY2RGB cv::COLOR_GRAY2RGB
#endif
#ifndef CV_SORT_EVERY_COLUMN
#define CV_SORT_EVERY_COLUMN cv::SORT_EVERY_COLUMN
#endif
#ifndef CV_SORT_ASCENDING
#define CV_SORT_ASCENDING cv::SORT_ASCENDING
#endif
