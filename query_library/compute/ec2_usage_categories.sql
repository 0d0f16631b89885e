-- EC2 Usage Categorization
-- Description: EC2 cost breakdown by usage element (reference dialect: :: casts)
-- Output: daily usage-category costs

SELECT
  line_item_usage_account_id,
  line_item_usage_start_date::date AS usage_day,
  CASE
    WHEN line_item_usage_type LIKE '%BoxUsage%' THEN 'EC2 Instance Usage'
    WHEN line_item_usage_type LIKE '%SpotUsage%' THEN 'Spot Usage'
    WHEN line_item_usage_type LIKE '%EBS%' THEN 'EBS Storage'
    WHEN line_item_usage_type LIKE '%DataTransfer%' THEN 'Data Transfer'
    WHEN line_item_usage_type LIKE '%NatGateway%' THEN 'NAT Gateway'
    ELSE 'Other'
  END AS usage_category,
  SUM(line_item_unblended_cost) AS cost,
  SUM(line_item_usage_amount) AS usage_amount
FROM CUR
WHERE line_item_product_code = 'AmazonEC2'
  AND line_item_unblended_cost > 0
GROUP BY 1, 2, 3
ORDER BY 1, 2, cost DESC
